"""Fixed-point quantization kernel (reference: quantize.cucl + the
per-layer quantize_ops hook gen_op_quantize rtc_fwd.cc:28-37,106; notes in
doc/quant_notes.txt): clamp to ±max_val and drop mantissa bits below
keep_bits — emulating reduced-precision feature maps for accuracy studies.
"""

from __future__ import annotations

import numpy as np

from ..op_base import OpBase
from ..registry import INOUT, KernelTemplate, adecl, template


def _params(rfs: OpBase):
    mv = rfs.nda_vals.get("max_val")
    kb = rfs.nda_vals.get("keep_bits")
    max_val = float(mv.item()) if mv is not None and mv.v is not None else 1.0
    keep_bits = int(kb.item()) if kb is not None and kb.v is not None else 8
    return max_val, keep_bits


@template
class Quantize(KernelTemplate):
    name = "quantize"
    nhwc_ok = True  # whole-tensor reduction/elementwise: layout agnostic
    args = [adecl("inout", INOUT, "img chan y x")]
    sig_nda_keys = ["max_val", "keep_bits"]

    @classmethod
    def build(cls, rfs: OpBase):
        import jax.numpy as jnp
        max_val, keep_bits = _params(rfs)
        levels = float(1 << keep_bits)

        def fn(x):
            c = jnp.clip(x, -max_val, max_val)
            return jnp.round(c / max_val * levels) * (max_val / levels)
        return fn

    @classmethod
    def ref_impl(cls, rfs: OpBase, x):
        max_val, keep_bits = _params(rfs)
        levels = float(1 << keep_bits)
        c = np.clip(np.asarray(x, np.float64), -max_val, max_val)
        return (np.round(c / max_val * levels) * (max_val / levels)).astype(np.asarray(x).dtype)
