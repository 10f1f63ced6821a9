"""Display/viz layer tests (reference: disp_app.cc display_test/display_pil,
data-to-img.cc nda heatmaps; file-backed here)."""

import numpy as np
import pytest

pytest.importorskip("PIL")

from boda_tpu.core.has_main import create_and_run_has_main  # noqa: E402
from boda_tpu.io.disp import annotate_img, make_montage, nda_to_img  # noqa: E402


def test_annotate_and_montage():
    img = np.zeros((64, 64, 3), np.uint8)
    out = annotate_img(img, [((8, 8, 24, 24), "cat"), ((30, 30, 60, 60), "dog")])
    assert out.shape == (64, 64, 3)
    assert out.sum() > 0  # something was drawn
    m = make_montage([out, out, out])
    assert m.shape[0] > 64 and m.shape[1] > 64


def test_nda_to_img():
    v = np.linspace(0, 1, 64).reshape(8, 8)
    g = nda_to_img(v, "gray")
    assert g.shape == (8, 8, 3) and g.max() == 255 and g.min() == 0
    h = nda_to_img(np.random.randn(4, 8, 8), "heat")  # collapses leading dim
    assert h.shape == (8, 8, 3)


def test_display_test_mode(tmp_path, capsys):
    create_and_run_has_main(
        f"(mode=display_test,out_dir={tmp_path}/f,num_frames=3)", {})
    assert "wrote 3 frames" in capsys.readouterr().out
    assert len(list((tmp_path / "f").glob("frame_*.png"))) == 3


def test_display_pil_mode(tmp_path, capsys):
    from boda_tpu.io.img import save_img
    (tmp_path / "imgs").mkdir()
    (tmp_path / "ann").mkdir()
    ids = ["000001", "000002"]
    for i in ids:
        save_img(tmp_path / "imgs" / f"{i}.jpg",
                 np.random.randint(0, 255, (48, 48, 3), dtype=np.uint8))
        (tmp_path / "ann" / f"{i}.xml").write_text(
            "<annotation><object><name>cat</name><difficult>0</difficult>"
            "<bndbox><xmin>5</xmin><ymin>5</ymin><xmax>20</xmax>"
            "<ymax>20</ymax></bndbox></object></annotation>")
    (tmp_path / "set.txt").write_text("\n".join(ids) + "\n")
    create_and_run_has_main(
        f"(mode=display_pil,imgset_fn={tmp_path}/set.txt,"
        f"ann_dir={tmp_path}/ann,img_dir={tmp_path}/imgs,"
        f"out_dir={tmp_path}/out)", {})
    assert "wrote 2 annotated images" in capsys.readouterr().out
    assert len(list((tmp_path / "out").glob("*.png"))) == 2


def test_stream_viz_stages(tmp_path):
    from boda_tpu.io.data_stream import make_data_stream, read_all_blocks
    ds = make_data_stream(
        f"(mode=pipe,stages=((mode=test-gen,num=3,sz=64),"
        f"(mode=data-to-img),(mode=img-sink,out_dir={tmp_path}/v)))")
    bs = read_all_blocks(ds)
    assert len(bs) == 3
    assert bs[0].meta == "image"
    assert len(list((tmp_path / "v").glob("img_*.png"))) == 3
