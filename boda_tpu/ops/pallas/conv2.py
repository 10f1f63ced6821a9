"""xla_conv2: horizontally-fused sibling convolutions.

TPU-motivated variant (no CUDA analog; the reference's closest idea is
the k1conv write-xpose chaining, rtc_fwd.cc:495-503): two convolutions
that share the SAME input, stride, padding, and kernel size — the
branch1 projection + branch2a reduce pair at every ResNet stage
boundary — run as ONE conv whose filters are concatenated on out_chan,
then split. Why it wins on the MXU: the siblings' N dims are narrow
(64/256 at res2a) and each standalone conv re-reads the full input from
HBM; fused, N widens to the lane width and the input streams once
(measured b128 res2a pair: 0.91 -> 0.21 ms isolated).

Per-sibling ReLU flags are preserved (branch1 has no ReLU, branch2a
does). Selected by the `fuse_siblings` lowering pass (engine/lower.py),
gated by OpTune(fuse_siblings=1).
"""

from __future__ import annotations

import numpy as np

from ...core.dims import Dims
from ..op_base import OpBase
from ..registry import IN, OUT, KernelTemplate, adecl, template
from .conv import _quantize_conv_operands
from .sgemm import _dot_precision


def _params2(rfs: OpBase):
    ind = rfs.get_dims("in")
    oa = rfs.get_dims("out_a")
    ob = rfs.get_dims("out_b")
    st = rfs.get_dims_or_none("stride")
    pad = rfs.get_dims_or_none("in_pad")
    return (ind, oa, ob, rfs.get_dims("filts_a"), rfs.get_dims("filts_b"),
            (st["y"], st["x"]) if st else (1, 1),
            (pad["y"], pad["x"]) if pad else (0, 0),
            rfs.get_u32_or("relu_a", 0) == 1, rfs.get_u32_or("relu_b", 0) == 1)


@template
class XlaConv2(KernelTemplate):
    name = "xla_conv2"
    nhwc_ok = True
    args = [adecl("in", IN, "img chan y x"),
            adecl("filts_a", IN, "out_chan in_chan y x"),
            adecl("biases_a", IN, "out_chan", opt=True),
            adecl("filts_b", IN, "out_chan in_chan y x"),
            adecl("biases_b", IN, "out_chan", opt=True),
            adecl("out_a", OUT, "img chan y x"),
            adecl("out_b", OUT, "img chan y x")]
    sig_nda_keys = ["in_pad", "stride", "kern_sz", "relu_a", "relu_b",
                    "quant8"]
    sig_str_keys = ["prec", "layout"]

    @classmethod
    def flops(cls, rfs: OpBase) -> int:
        ind, oa, ob, fa, fb, _s, _p, _ra, _rb = _params2(rfs)
        k = fa["y"] * fa["x"]
        return 2 * oa.sz() * fa["in_chan"] * k + 2 * ob.sz() * fb["in_chan"] * k

    @classmethod
    def ref_impl(cls, rfs: OpBase, x, wa, ba, wb, bb):
        from .conv import _ConvBase
        outs = []
        for sub, w, b, relu_key in (("out_a", wa, ba, "relu_a"),
                                    ("out_b", wb, bb, "relu_b")):
            sr = OpBase({"type": "Convolution"})
            sr.nda_vals["in"] = rfs.nda_vals["in"]
            sr.nda_vals["filts"] = rfs.nda_vals[
                "filts_a" if sub == "out_a" else "filts_b"]
            sr.nda_vals["out"] = rfs.nda_vals[sub]
            for k in ("in_pad", "stride", "kern_sz"):
                if k in rfs.nda_vals:
                    sr.nda_vals[k] = rfs.nda_vals[k]
            if rfs.get_u32_or(relu_key, 0):
                sr.set_u32("conv_has_relu", 1)
            outs.append(_ConvBase.ref_impl(sr, x, w, b))
        return tuple(outs)

    @classmethod
    def build(cls, rfs: OpBase):
        import jax
        import jax.numpy as jnp

        from .util import storage_io
        ind, oa, ob, fa, fb, (sy, sx), (py, px), relu_a, relu_b = _params2(rfs)
        na, nb = fa["out_chan"], fb["out_chan"]
        bf16 = rfs.str_vals.get("prec") == "bf16"
        quant8 = rfs.get_u32_or("quant8", 0) == 1
        io_nhwc, edt = storage_io(rfs)
        cdt = jnp.bfloat16 if bf16 else jnp.float32
        out_dt_a = (edt or oa.dtype) if io_nhwc else oa.dtype
        out_dt_b = (edt or ob.dtype) if io_nhwc else ob.dtype

        def fn(x, wa, ba, wb, bb):
            w = jnp.concatenate([wa, wb], axis=0)       # (na+nb, ic, ky, kx)
            b = jnp.concatenate([ba, bb], axis=0)
            wh = jnp.transpose(w, (2, 3, 1, 0))
            xh = x if io_nhwc else jnp.transpose(x, (0, 2, 3, 1))
            if quant8:
                xq, wq, sc = _quantize_conv_operands(xh, wh, (0, 1, 2))
                y = jax.lax.conv_general_dilated(
                    xq, wq, window_strides=(sy, sx),
                    padding=((py, py), (px, px)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                y = y.astype(jnp.float32) * sc
            else:
                y = jax.lax.conv_general_dilated(
                    xh.astype(cdt), wh.astype(cdt), window_strides=(sy, sx),
                    padding=((py, py), (px, px)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                    precision=_dot_precision(jnp.dtype(cdt)))
            y = y + b.astype(y.dtype)[None, None, None, :]
            ya, yb = y[..., :na], y[..., na:]
            if relu_a:
                ya = jnp.maximum(ya, 0)
            if relu_b:
                yb = jnp.maximum(yb, 0)
            if io_nhwc:
                return ya.astype(out_dt_a), yb.astype(out_dt_b)
            return (jnp.transpose(ya, (0, 3, 1, 2)).astype(out_dt_a),
                    jnp.transpose(yb, (0, 3, 1, 2)).astype(out_dt_b))
        return fn
