"""bwai bandwidth micro-benchmark template (reference: test/rtc/bwai.cucl
+ mxplusb smoke kernel roles)."""

import numpy as np
import pytest

from boda_tpu.core.dims import Dims
from boda_tpu.ops.op_base import OpBase
from boda_tpu.ops.registry import get_template


def _op(bw_op, n=4096, tn="float"):
    op = OpBase({"type": "bwai", "func_name": "bwai", "bw_op": bw_op})
    op.set_dims("in", Dims.make(tn=tn, n=n))
    # read's output is tiny so the probe stays read-only (ADVICE r2)
    op.set_dims("out", Dims.make(tn=tn, n=8 if bw_op == "read" else n))
    return op


@pytest.mark.parametrize("bw_op", ["copy", "scale", "read"])
def test_bwai_build_matches_ref(bw_op):
    tmpl = get_template("bwai")
    rfs = tmpl.check_args(_op(bw_op))
    fn = tmpl.build(rfs)
    x = (np.random.RandomState(0).randn(4096) * 3).astype(np.float32)
    got = np.asarray(fn(x))
    want = tmpl.ref_impl(rfs, x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert tmpl.bytes_accessed(rfs) == (
        4096 * 4 + 8 * 4 if bw_op == "read" else 2 * 4096 * 4)
    assert tmpl.flops(rfs) == {"copy": 0, "scale": 2 * 4096, "read": 4096}[bw_op]


def test_bwai_through_profiler():
    """bwai runs under the ops_prof machinery like any op (the reference
    profiled bwai.cucl the same way)."""
    from boda_tpu.backend.iface import make_backend
    from boda_tpu.ops.registry import Codegen
    from boda_tpu.tune.prof import profile_rcg_call

    be = make_backend("xla")
    be.init()
    cg = Codegen(be)
    secs, outs = profile_rcg_call(cg, _op("scale"), run_iter=2)
    # slope timing of a ~us op can go slightly negative under CPU noise
    # (wisdom records guard non-positive secs; see tune/wisdom.py)
    assert np.isfinite(secs)
    assert outs["out"].dims.shape == (4096,)
    assert float(np.abs(outs["out"].v).sum()) > 0
