"""Dense multi-scale prediction tests (apps/predict.py; reference
caffeif.cc:249-560 scale_infos / do_predict_region / nms_grid /
pred_state_to_annos)."""

import numpy as np
import pytest

from boda_tpu.apps.predict import Anno, DensePredictor, PredScaleInfo
from boda_tpu.core.geom import Box, Pt
from boda_tpu.graph.support import SupportInfo


def _csi(sup=32, stride=8, pad=4):
    return SupportInfo(support_sz=Pt(sup, sup), support_stride=Pt(stride, stride),
                       eff_tot_pad=Pt(pad, pad))


def _mk_single(n_chans=4, fy=3, fx=3, **kw):
    p = DensePredictor([f"lbl{i}" for i in range(n_chans)], **kw)
    p.setup_single_scale(_csi(), Pt(fy, fx), Pt(64, 64), n_chans)
    return p


class TestImgBoxes:
    def test_feat_pixel_maps_to_support_box(self):
        p = _mk_single()
        st = p._states[0]
        # feat pixel (0,0): valid support = [0*8+0-4, 0*8+32-4) = [-4, 28)
        np.testing.assert_array_equal(st.img_boxes[0, 0], [-4, -4, 28, 28])
        # feat pixel (2,1): y=[2*8-4, 2*8+32-4)=[12,44), x=[8-4,36)=[4,36)
        np.testing.assert_array_equal(st.img_boxes[2, 1], [12, 4, 44, 36])

    def test_nominal_scaling_and_place_shift(self):
        """Placed scale: boxes shift by place then scale img_sz→nominal
        with C++ trunc-div semantics (caffeif.cc:278-283)."""
        p = DensePredictor(["a", "b"])
        p.nominal_in_sz = Pt(100, 100)
        si = PredScaleInfo(img_sz=Pt(50, 50), bix=0, place=Pt(10, 20),
                           feat_box=Box(Pt(2, 3), Pt(4, 5)))
        p.scale_infos = [si]
        p._setup_pred_state(_csi(), None, 2)
        st = p._states[0]
        # pixel (2,3): in=[2*8-4,2*8+32-4)=[12,44) y; x=[3*8-4,3*8+32-4)=[20,52)
        # shift place: y -= 10 -> [2,34); x -= 20 -> [0,32)
        # scale *100/50 = *2 -> y [4,68) x [0,64)
        np.testing.assert_array_equal(st.img_boxes[0, 0], [4, 0, 68, 64])

    def test_global_support_whole_image(self):
        csi = SupportInfo(support_sz=Pt(0, 0), support_stride=Pt(1, 1),
                          eff_tot_pad=Pt(0, 0))
        p = DensePredictor(["a"])
        p.setup_single_scale(csi, Pt(1, 1), Pt(64, 48), 1)
        np.testing.assert_array_equal(p._states[0].img_boxes[0, 0],
                                      [0, 0, 64, 48])


class TestPredictRegion:
    def test_pdf_passthrough(self):
        """Channels already summing to 1 are used as-is (is-PDF check,
        caffeif.cc:524-531)."""
        p = _mk_single(n_chans=2, fy=1, fx=1)
        probs = np.array([[[0.7]], [[0.3]]])
        p.do_predict(probs[None])
        np.testing.assert_allclose(p._states[0].cur_prob[:, 0, 0], [0.7, 0.3])

    def test_softmax_applied_to_raw_feats(self):
        p = _mk_single(n_chans=2, fy=1, fx=1)
        feats = np.array([[[2.0]], [[0.0]]])
        p.do_predict(feats[None])
        e = np.exp([0.0, -2.0])
        np.testing.assert_allclose(p._states[0].cur_prob[:, 0, 0],
                                   e / e.sum(), rtol=1e-12)

    def test_filter_hysteresis(self):
        """to_disp turns on at show_thresh, stays on until drop_thresh
        (caffeif.cc:548-556)."""
        p = _mk_single(n_chans=2, fy=1, fx=1, filt_rate=0.5,
                       filt_show_thresh=0.6, filt_drop_thresh=0.2)
        hi = np.array([[[0.9]], [[0.1]]])
        lo = np.array([[[0.4]], [[0.6]]])
        p.do_predict(hi[None])  # filt=0.9 -> on
        assert p._states[0].to_disp[0, 0, 0]
        p.do_predict(lo[None])  # filt=0.65 -> still above drop, stays on
        assert p._states[0].to_disp[0, 0, 0]
        for _ in range(5):
            p.do_predict(lo[None])  # filt -> 0.4: between thresholds: keeps state
        assert p._states[0].to_disp[0, 0, 0]
        zero = np.array([[[0.0]], [[1.0]]])
        for _ in range(8):
            p.do_predict(zero[None])  # filt -> ~0: below drop -> off
        assert not p._states[0].to_disp[0, 0, 0]


class TestAnnos:
    def test_topk_and_label_dedupe(self):
        p = _mk_single(n_chans=3, fy=1, fx=1, filt_rate=1.0,
                       max_labels_per_anno=2)
        probs = np.array([[[0.5]], [[0.3]], [[0.2]]])
        annos = p.do_predict(probs[None])
        assert len(annos) == 1
        # same box, labels capped at 2, sorted by prob
        lines = annos[0].str.splitlines()
        assert len(lines) == 2
        assert lines[0].startswith("lbl0")
        assert lines[1].startswith("lbl1")

    def test_nms_suppresses_heavily_overlapping_distinct_boxes(self):
        """Two feature pixels with nearly identical support boxes: second
        merges into the first's anno (3/4 center-match rule)."""
        p = DensePredictor(["a", "b"], filt_rate=1.0, nms_grid_pels=Pt(4, 4))
        csi = SupportInfo(support_sz=Pt(32, 32), support_stride=Pt(1, 1),
                          eff_tot_pad=Pt(0, 0))
        p.setup_single_scale(csi, Pt(1, 2), Pt(33, 34), 2)
        probs = np.zeros((1, 2, 1, 2))
        probs[0, 0, 0, 0] = 0.9  # box [0,0,32,32]
        probs[0, 1, 0, 1] = 0.8  # box [0,1,32,33] — same quantized core
        annos = p.do_predict(probs)
        assert len(annos) == 1
        assert annos[0].item_cnt == 2

    def test_far_apart_boxes_get_separate_annos(self):
        p = DensePredictor(["a"], filt_rate=1.0, nms_grid_pels=Pt(4, 4))
        csi = SupportInfo(support_sz=Pt(8, 8), support_stride=Pt(64, 64),
                          eff_tot_pad=Pt(0, 0))
        p.setup_single_scale(csi, Pt(1, 2), Pt(256, 256), 1)
        probs = np.full((1, 1, 1, 2), 0.9)
        annos = p.do_predict(probs)
        assert len(annos) == 2

    def test_max_num_disp_caps_total(self):
        p = DensePredictor([f"l{i}" for i in range(8)], filt_rate=1.0,
                           max_num_disp=3, max_labels_per_anno=8)
        p.setup_single_scale(_csi(), Pt(1, 1), Pt(64, 64), 8)
        probs = np.full((1, 8, 1, 1), 0.125)
        annos = p.do_predict(probs)
        assert sum(a.item_cnt for a in annos) == 3


class TestMultiScale:
    def test_setup_scale_infos_valid_boxes(self):
        """Valid feature boxes shrink with support and shift with placement
        (caffeif.cc:326-334)."""
        p = DensePredictor(["x"])
        csi = _csi(sup=16, stride=8, pad=4)
        p.setup_scale_infos(
            csi, interval=1,
            sizes=[Pt(64, 64), Pt(32, 32)],
            placements=[(0, Pt(0, 0)), (0, Pt(80, 0))],
            nominal_in_sz=Pt(64, 64), num_chans=1, feat_sz=Pt(16, 16))
        assert len(p.scale_infos) == 2
        fb0, fb1 = p.scale_infos[0].feat_box, p.scale_infos[1].feat_box
        assert fb0.is_strictly_normalized() and fb1.is_strictly_normalized()
        # scale 1 placed at y=80: its feature box starts past scale 0's
        assert fb1.p0.y > fb0.p0.y

    def test_global_support_rejected(self):
        p = DensePredictor(["x"])
        csi = SupportInfo(support_sz=Pt(0, 0), support_stride=Pt(1, 1),
                          eff_tot_pad=Pt(0, 0))
        with pytest.raises(Exception, match="madness"):
            p.setup_scale_infos(csi, 1, [Pt(8, 8)], [(0, Pt(0, 0))],
                                Pt(8, 8), 1, Pt(4, 4))
