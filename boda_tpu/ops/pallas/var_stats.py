"""Per-tensor statistics kernel (reference: var_stats.cucl tree reduction +
gen_op_stats rtc_fwd.cc:105-200): computes min/max/avg/sum-of-squares per
layer on device, surfaced by the executor's enable_stats path.
"""

from __future__ import annotations

import numpy as np

from ..op_base import OpBase
from ..registry import IN, OUT, KernelTemplate, adecl, template

STAT_NAMES = ("min", "max", "avg", "ssqs")


@template
class VarStats(KernelTemplate):
    """stats = [min, max, avg, sum_of_squares] of `in` (4-vector out)."""

    name = "var_stats"
    nhwc_ok = True  # whole-tensor reduction/elementwise: layout agnostic
    args = [adecl("in", IN, ""), adecl("stats", OUT, "n")]
    sig_nda_keys = ["in"]

    @classmethod
    def check_args(cls, op: OpBase) -> OpBase:
        rfs = OpBase({"func_name": cls.name})
        rfs.nda_vals["in"] = op.nda_vals["in"]
        from ...core.dims import Dims
        from ...core.dims import NDA
        rfs.nda_vals["stats"] = NDA(Dims.make(n=4))
        return rfs

    @classmethod
    def in_args(cls):
        return ["in"]

    @classmethod
    def out_args(cls):
        return ["stats"]

    @classmethod
    def io_args(cls):
        return []

    @classmethod
    def build(cls, rfs: OpBase):
        import jax.numpy as jnp

        def fn(x):
            xf = x.astype(jnp.float32)
            return jnp.stack([jnp.min(xf), jnp.max(xf), jnp.mean(xf),
                              jnp.sum(xf * xf)])
        return fn

    @classmethod
    def ref_impl(cls, rfs: OpBase, x):
        xf = np.asarray(x, np.float64)
        return np.array([xf.min(), xf.max(), xf.mean(), (xf * xf).sum()],
                        dtype=np.float32)
