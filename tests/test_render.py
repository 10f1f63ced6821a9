"""add-img-pts point-cloud renderer (os-render.cc analog, GL-free)."""

import numpy as np
import pytest

import boda_tpu.io.disp  # noqa: F401
import boda_tpu.io.render  # noqa: F401
import boda_tpu.io.velodyne  # noqa: F401
from boda_tpu.core.dims import NDA, Dims
from boda_tpu.core.error import RtErr
from boda_tpu.io.data_stream import DataBlock, make_data_stream


def _cloud_block(pts):
    pts = np.asarray(pts, np.float32).reshape(1, -1, 3)
    return DataBlock(nda=NDA(Dims.make(tn="float", y=1, x=pts.shape[1],
                                       xyz=3), pts), tag="pc",
                     meta="pointcloud")


def test_render_attaches_image_and_zbuffers():
    # two points along the camera ray at phi=180 (camera at -y looking +y):
    # the NEARER one (more negative y) must win the center pixel
    near = [0.0, -5.0, 0.0]
    far = [0.0, 20.0, 4.9]   # high z -> hot color, but occluded center
    ds = make_data_stream("(mode=add-img-pts,cam_theta=0,cam_phi=180,"
                          "cam_r=40,disp_sz=64 64,pt_sz=1,grid_cells=0)")
    out = ds.proc_block(_cloud_block([near, far]))
    img = out.get_sdb("as_img").nda.v
    assert img.shape == (64, 64, 3)
    center = img[32, 32]
    assert center.any()
    # near point height 0 -> mid ramp, not the hot (red-dominant) far color
    assert not (center[0] > 200 and center[2] < 60)


def test_render_replace_feeds_img_sink(tmp_path):
    ds = make_data_stream(
        f"(mode=pipe,stages=(_0=(mode=add-img-pts,replace=1,disp_sz=48 32),"
        f"_1=(mode=img-sink,out_dir={tmp_path}/f)))")
    out = ds.proc_block(_cloud_block([[1, 2, 0.5], [3, -1, 1.5]]))
    assert out.nda.dims.shape == (32, 48, 3)
    assert (tmp_path / "f" / "img_00000.png").exists()


def test_render_rejects_non_cloud():
    ds = make_data_stream("(mode=add-img-pts)")
    db = DataBlock(nda=NDA(Dims.make(tn="float", y=4, x=4),
                           np.zeros((4, 4), np.float32)))
    with pytest.raises(RtErr, match="point-cloud"):
        ds.proc_block(db)


def test_render_velodyne_end_to_end():
    """lidar gen -> parse -> xyz -> render: the full os-render demo path."""
    ds = make_data_stream(
        "(mode=pipe,stages=("
        "_0=(mode=velodyne,fov_rot_samps=96,fov_center=0,tot_lasers=32,"
        "vps=(mode=velodyne-gen,src=(mode=velo-frame-gen,num=3,n_azi=96))),"
        "_1=(mode=velo-pcdm-to-xyz),"
        "_2=(mode=add-img-pts,replace=1)))")
    out = ds.proc_block(DataBlock())
    assert out.valid()
    assert out.nda.dims.shape == (300, 600, 3)
    assert int(out.nda.v.any(axis=-1).sum()) > 100  # actually drew points
