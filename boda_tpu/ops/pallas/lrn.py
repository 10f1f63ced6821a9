"""Local Response Normalization across channels (reference: lrn.cucl,
rtc_fwd.cc:334-344; caffe ACROSS_CHANNELS semantics).

out = in * (k + (alpha/n) * sum_{c'in window} in_{c'}^2)^(-beta)
with an n-channel window centered at each channel.
"""

from __future__ import annotations

import numpy as np

from ..op_base import OpBase
from ..registry import IN, OUT, KernelTemplate, adecl, template


def _params(rfs: OpBase):
    n = rfs.get_u32_or("local_size", 5)
    def fval(k, d):
        v = rfs.nda_vals.get(k)
        return float(v.item()) if v is not None and v.v is not None else d
    return n, fval("alpha", 1.0), fval("beta", 0.75), fval("k", 1.0)


@template
class Lrn(KernelTemplate):
    name = "lrn"
    nhwc_ok = True
    args = [adecl("in", IN, "img chan y x"), adecl("out", OUT, "img chan y x")]
    sig_nda_keys = ["local_size", "alpha", "beta", "k"]
    sig_str_keys = ["emit_out_scale_base"]

    @classmethod
    def build(cls, rfs: OpBase):
        import jax
        import jax.numpy as jnp
        n, alpha, beta, k = _params(rfs)
        pre = n // 2
        nhwc = rfs.str_vals.get("io_layout") == "nhwc"

        def fn(x):
            xf = x.astype(jnp.float32)
            sq = xf * xf
            # window-sum over chan via reduce_window with half-window padding
            cpad = (pre, n - 1 - pre)
            pad = ((0, 0), (0, 0), (0, 0), cpad) if nhwc                 else ((0, 0), cpad, (0, 0), (0, 0))
            win = (1, 1, 1, n) if nhwc else (1, n, 1, 1)
            sqp = jnp.pad(sq, pad)
            ssum = jax.lax.reduce_window(sqp, 0.0, jax.lax.add, win,
                                         (1, 1, 1, 1), "valid")
            scale = k + (alpha / n) * ssum
            return (xf * jnp.power(scale, -beta)).astype(x.dtype)
        return fn

    @classmethod
    def ref_impl(cls, rfs: OpBase, x):
        x = np.asarray(x, np.float64)
        n, alpha, beta, k = _params(rfs)
        pre = n // 2
        C = x.shape[1]
        sq = x * x
        out = np.empty_like(x)
        for c in range(C):
            c0, c1 = max(0, c - pre), min(C, c - pre + n)
            scale = k + (alpha / n) * sq[:, c0:c1].sum(axis=1)
            out[:, c] = x[:, c] * np.power(scale, -beta)
        return out.astype(np.asarray(x).dtype)
