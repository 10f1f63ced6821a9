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


def test_add_img_grey_and_rggb(tmp_path):
    from boda_tpu.core.dims import NDA, Dims
    from boda_tpu.io.data_stream import DataBlock, make_data_stream

    def frame(v):
        return DataBlock(nda=NDA(Dims.make(tn="uint16_t", y=v.shape[0],
                                           x=v.shape[1]), v), frame_ix=0)

    # 16u grey gradient: full-range normalization
    v = np.linspace(0, 4000, 4 * 8, dtype=np.uint16).reshape(4, 8)
    st = make_data_stream("(mode=add-img,img_fmt=16u-grey)")
    out = st.proc_block(frame(v))
    img = out.get_sdb("img").nda.v
    assert img.shape == (4, 8, 3) and img.dtype == np.uint8
    assert img[0, 0, 0] == 0 and img[-1, -1, 0] == 255
    assert out.nda is not None  # raw frame preserved
    # invert
    sti = make_data_stream("(mode=add-img,img_fmt=16u-grey,invert_intensity=1)")
    assert sti.proc_block(frame(v)).get_sdb("img").nda.v[0, 0, 0] == 255
    # RGGB bayer: constant-color mosaic demosaics to half-res constant RGB
    b = np.zeros((8, 8), np.uint16)
    b[0::2, 0::2] = 4000   # R
    b[0::2, 1::2] = 2000   # G
    b[1::2, 0::2] = 2000   # G
    b[1::2, 1::2] = 100    # B
    stb = make_data_stream("(mode=add-img,img_fmt=16u-RGGB,level_adj=0)")
    rgb = stb.proc_block(frame(b)).get_sdb("img").nda.v
    assert rgb.shape == (4, 4, 3)
    assert rgb[0, 0, 0] > rgb[0, 0, 1] > rgb[0, 0, 2]
    # 32f grey via the pipeline into img-sink (the cap_app display path)
    stf = make_data_stream(
        f"(mode=pipe,stages=((mode=add-img,img_fmt=32f-grey),"
        f"(mode=img-sink,out_dir={tmp_path}/o)))")
    fv = np.linspace(0.0, 1.0, 16, dtype=np.float32).reshape(4, 4)
    db = DataBlock(nda=NDA(Dims.make(tn="float", y=4, x=4), fv))
    stf.proc_block(db)
    assert len(list((tmp_path / "o").glob("img_*.png"))) == 1
    # bad format errors
    import pytest as _pt
    from boda_tpu.core.error import RtErr as _RtErr
    with _pt.raises(_RtErr, match="unknown img_fmt"):
        make_data_stream("(mode=add-img,img_fmt=8u-grey)")


def test_add_img_level_filter_tracks():
    """sliding min/max window: second frame normalized with LPF'd levels."""
    from boda_tpu.core.dims import NDA, Dims
    from boda_tpu.io.data_stream import DataBlock, make_data_stream
    st = make_data_stream("(mode=add-img,img_fmt=16u-grey,level_filt_alpha=0.5)")

    def run(v):
        db = DataBlock(nda=NDA(Dims.make(tn="uint16_t", y=2, x=2),
                               np.asarray(v, np.uint16)))
        return st.proc_block(db).get_sdb("img").nda.v

    run([[0, 100], [200, 300]])
    # brighter frame: window lags, so top clips to 255
    img2 = run([[0, 300], [600, 900]])
    assert img2[1, 1, 0] == 255


def test_ds_test_mode(tmp_path, capsys):
    from boda_tpu.core.has_main import create_and_run_has_main
    from boda_tpu.io.img import save_img
    p = tmp_path / "in.png"
    save_img(p, np.random.randint(0, 255, (16, 12, 3), dtype=np.uint8))
    create_and_run_has_main(
        f"(mode=ds_test,image_fn={p},out_dir={tmp_path}/pyr)", {})
    out = capsys.readouterr().out
    assert "level 0: 16x12" in out
    levels = sorted((tmp_path / "pyr").glob("level_*.png"))
    assert len(levels) >= 4  # 16x12 -> 8x6 -> 4x3 -> 2x1


def test_display_raw_vid_mode(tmp_path, capsys):
    from boda_tpu.core.has_main import create_and_run_has_main
    create_and_run_has_main(
        "(mode=display_raw_vid,max_frames=3,display_downsample_factor=2,"
        "src=(mode=pipe,stages=((mode=velo-frame-gen,num=5,n_azi=64),"
        "(mode=add-img,img_fmt=16u-grey))),"
        f"out_dir={tmp_path}/rv,print_timestamps=1)", {})
    out = capsys.readouterr().out
    assert "wrote 3 frames" in out and "ts=" in out
    frames = sorted((tmp_path / "rv").glob("frame_*.png"))
    assert len(frames) == 3
    import numpy as np
    from PIL import Image
    assert np.asarray(Image.open(frames[0])).shape[:2] == (16, 32)  # 32x64/2

def test_img_add_text():
    """img-add-text (data-stream-img-util.cc:12): draws pixels, prefixes
    meta/tag, errors on non-image blocks."""
    import pytest as _pt
    from boda_tpu.core.dims import NDA, Dims
    from boda_tpu.core.error import RtErr as _RtErr
    from boda_tpu.io.data_stream import DataBlock, make_data_stream

    def img_db():
        v = np.zeros((32, 64, 3), np.uint8)
        return DataBlock(nda=NDA(Dims.make(tn="uint8_t", y=32, x=64, chan=3),
                                 v), tag="t0", meta="m0 ")

    st = make_data_stream("(mode=img-add-text,text_str=hi,text_pos=2:2,"
                          "color=255:255:255)")
    out = st.proc_block(img_db())
    assert out.nda.v.shape == (32, 64, 3)
    assert out.nda.v.sum() > 0          # text drew something on black
    # meta/tag prefixes change the rendering (longer string -> more pixels)
    stp = make_data_stream("(mode=img-add-text,text_str=hi,text_pos=2:2,"
                           "color=255:255:255,prefix_with_meta=1,"
                           "prefix_with_tag=1)")
    outp = stp.proc_block(img_db())
    assert outp.nda.v.sum() > out.nda.v.sum()
    # operates on an add-img 'img' subblock when present
    raw = DataBlock(nda=NDA(Dims.make(tn="uint16_t", y=8, x=16),
                            np.zeros((8, 16), np.uint16)))
    pipe = make_data_stream("(mode=pipe,stages=((mode=add-img,"
                            "img_fmt=16u-grey),(mode=img-add-text,"
                            "text_str=x,text_pos=1:1,color=255:0:0)))")
    ob = pipe.proc_block(raw)
    assert ob.get_sdb("img").nda.v.sum() > 0
    assert ob.nda is not None           # raw frame preserved
    # non-image block errors (reference error string)
    bad = DataBlock(nda=NDA(Dims.make(tn="float", y=4, x=4),
                            np.zeros((4, 4), np.float32)))
    with _pt.raises(_RtErr, match="expected a data block with an image"):
        st.proc_block(bad)
    # bad arg strings
    with _pt.raises(_RtErr, match="bad color"):
        make_data_stream("(mode=img-add-text,text_str=a,color=red)"
                         ).proc_block(img_db())
    with _pt.raises(_RtErr, match="bad text_pos"):
        make_data_stream("(mode=img-add-text,text_str=a,text_pos=zz)"
                         ).proc_block(img_db())
