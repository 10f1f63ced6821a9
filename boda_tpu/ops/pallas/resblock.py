"""resblock: fused ResNet bottleneck (1x1 → 3x3 → 1x1 + shortcut add +
ReLUs) as one Pallas kernel.

Motivation (ROUND1_NOTES perf breakdown): ResNet-50's time is HBM-bound
in the high-resolution stages — at b128 each stage-2 activation tensor is
~205MB, and the unfused block writes/reads the full plane five times.
This kernel keeps the whole block resident in VMEM per (image) grid step:
one HBM read of x, one HBM write of the output — ~3x less block traffic.

Scope: identity-shortcut bottleneck (stride 1, in_chan == out_chan), the
2-of-3 blocks per ResNet stage. Projection blocks stay unfused.

Layout: NHWC in-kernel (lane = channels); the host pads W to the bf16
sublane multiple and H by the 3x3 halo. The 1x1 convs are (H·W, C)
matmuls; the 3x3 is tconv-style tap accumulation. A border mask zeroes
the halo of the first conv's output so the 3x3 sees zero padding.
"""

from __future__ import annotations

import numpy as np

from ..op_base import OpBase
from ..registry import IN, OUT, KernelTemplate, adecl, template


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def build_resblock(rfs: OpBase):
    import jax
    import jax.numpy as jnp

    from .util import pallas_call, pallas_mode, storage_io

    xd = rfs.get_dims("in")
    w2d = rfs.get_dims("w2")
    n, C, H, W = xd.shape           # logical NCHW edges
    Cm = w2d["out_chan"]
    relu_out = rfs.get_u32_or("relu_out", 1) == 1
    bf16 = rfs.str_vals.get("prec") == "bf16"
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    io_nhwc, edt = storage_io(rfs)
    out_dt = (edt or xd.dtype) if io_nhwc else xd.dtype

    def fallback(x, w1, b1, w2, b2, w3, b3):
        from .sgemm import _dot_precision
        if io_nhwc:  # storage-NHWC edges: view as logical NCHW for the math
            x = jnp.transpose(x, (0, 3, 1, 2))
        xc = x.astype(cdt)
        prec = _dot_precision(xc.dtype)

        def conv(v, w, sy=1, sx=1, py=0, px=0):
            return jax.lax.conv_general_dilated(
                v, w.astype(cdt), window_strides=(sy, sx),
                padding=((py, py), (px, px)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32, precision=prec)

        h = jnp.maximum(conv(xc, w1) + b1.astype(jnp.float32)[None, :, None, None], 0)
        h = jnp.maximum(conv(h.astype(cdt), w2, py=1, px=1)
                        + b2.astype(jnp.float32)[None, :, None, None], 0)
        y = conv(h.astype(cdt), w3) + b3.astype(jnp.float32)[None, :, None, None]
        y = y + x.astype(jnp.float32)
        if relu_out:
            y = jnp.maximum(y, 0)
        if io_nhwc:
            return jnp.transpose(y, (0, 2, 3, 1)).astype(out_dt)
        return y.astype(out_dt)

    if pallas_mode() == "fallback":
        return fallback

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sub_al = 16 if bf16 else 8
    isz = 2 if bf16 else 4
    WA = _ceil_to(W, sub_al)        # aligned interior width
    WP = _ceil_to(WA + 2, sub_al)   # padded plane width (halo + alignment)
    # y-band the plane so the working set fits scoped VMEM (whole 56x56
    # stage-2 planes at C=256 OOM the 16MB limit)
    TY = H
    def _vmem_est(ty):
        tyi = ty + 2
        return (tyi * WP * (C + Cm) * isz          # xp + h1 scratches
                + 2 * ty * WA * C * isz            # double-buffered out
                + tyi * WP * max(C, Cm) * 4        # f32 dot intermediates
                + ty * WA * (C + Cm) * 4)          # acc + y
    while TY > 4 and _vmem_est(TY) > 9 * 2 ** 20:
        TY = -(-TY // 2)
    ny = -(-H // TY)
    HP = ny * TY + 2                # banded plane rows incl. halo
    TYI = TY + 2
    M = TY * WA                     # matmul rows per band

    def kern(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
             b3_ref, o_ref, xp_scr, h1_scr, sem):
        b = pl.program_id(0)
        t = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(t * TY, TYI)], xp_scr, sem)
        cp.start()
        cp.wait()
        # conv1 (1x1) over the band (masked so the 3x3 sees zero padding)
        xp = xp_scr[:]
        a = xp.reshape(TYI * WP, C)
        h1 = jnp.dot(a, w1_ref[:], preferred_element_type=jnp.float32)
        h1 = jnp.maximum(h1 + b1_ref[0].astype(jnp.float32)[None, :], 0)
        h1 = h1.reshape(TYI, WP, Cm)
        # border mask: global row index in [1, H], col in [1, W]
        rows = jax.lax.broadcasted_iota(jnp.int32, (TYI, WP, 1), 0) + t * TY
        cols = jax.lax.broadcasted_iota(jnp.int32, (TYI, WP, 1), 1)
        valid = ((rows >= 1) & (rows <= H) & (cols >= 1) & (cols <= W))
        h1 = h1 * valid.astype(h1.dtype)
        h1_scr[:] = h1.astype(cdt)
        # conv2 (3x3): fold all 9 taps into K — one (M, 9*Cm) x (9*Cm, Cm)
        # MXU matmul instead of 9 skinny K=Cm dots (which underuse the
        # MXU badly when Cm=64)
        cols = [h1_scr[yy:yy + TY, xx:xx + WA, :].reshape(M, Cm)
                for yy in range(3) for xx in range(3)]
        a2 = jnp.concatenate(cols, axis=1)              # (M, 9*Cm)
        acc = jnp.dot(a2, w2_ref[:].reshape(9 * Cm, Cm),
                      preferred_element_type=jnp.float32)
        h2 = jnp.maximum(acc + b2_ref[0].astype(jnp.float32)[None, :], 0)
        # conv3 (1x1) + shortcut + relu
        y = jnp.dot(h2.astype(cdt), w3_ref[:],
                    preferred_element_type=jnp.float32)
        y = y + b3_ref[0].astype(jnp.float32)[None, :]
        sc = xp_scr[1:1 + TY, 1:1 + WA, :].reshape(M, C)
        y = y + sc.astype(jnp.float32)
        if relu_out:
            y = jnp.maximum(y, 0)
        o_ref[0] = y.reshape(TY, WA, C).astype(o_ref.dtype)

    grid = (n, ny)
    call = pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((C, Cm), lambda b, t: (0, 0)),
            pl.BlockSpec((1, Cm), lambda b, t: (0, 0)),
            pl.BlockSpec((3, 3, Cm, Cm), lambda b, t: (0, 0, 0, 0)),
            pl.BlockSpec((1, Cm), lambda b, t: (0, 0)),
            pl.BlockSpec((Cm, C), lambda b, t: (0, 0)),
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TY, WA, C), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, ny * TY, WA, C), np.dtype(out_dt)),
        scratch_shapes=[pltpu.VMEM((TYI, WP, C), cdt),
                        pltpu.VMEM((TYI, WP, Cm), cdt),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * H * W * (C * Cm + 9 * Cm * Cm + Cm * C),
            bytes_accessed=2 * n * HP * WP * C * isz,
            transcendentals=0),
    )

    def fn(x, w1, b1, w2, b2, w3, b3):
        xc = x.astype(cdt)
        xh = xc if io_nhwc else jnp.transpose(xc, (0, 2, 3, 1))  # NHWC
        xp = jnp.pad(xh, ((0, 0), (1, HP - H - 1), (1, WP - W - 1), (0, 0)))
        args = [xp,
                jnp.transpose(w1.astype(cdt), (1, 0)).reshape(C, Cm)
                if w1.ndim == 2 else
                jnp.transpose(w1.astype(cdt), (2, 3, 1, 0)).reshape(C, Cm),
                b1.astype(cdt).reshape(1, Cm),
                jnp.transpose(w2.astype(cdt), (2, 3, 1, 0)),
                b2.astype(cdt).reshape(1, Cm),
                jnp.transpose(w3.astype(cdt), (2, 3, 1, 0)).reshape(Cm, C)
                if w3.ndim == 4 else
                jnp.transpose(w3.astype(cdt), (1, 0)).reshape(Cm, C),
                b3.astype(cdt).reshape(1, C)]
        y = call(*args)                       # (n, ny*TY, WA, C)
        y = y[:, :H, :W, :]
        if io_nhwc:
            return y.astype(out_dt)
        return jnp.transpose(y, (0, 3, 1, 2))
    return fn


@template
class ResBlock(KernelTemplate):
    """Fused identity-shortcut bottleneck (see module docstring)."""

    name = "resblock"
    nhwc_ok = True
    args = [adecl("in", IN, "img chan y x"),
            adecl("w1", IN, "out_chan in_chan y x"),
            adecl("b1", IN, "out_chan"),
            adecl("w2", IN, "out_chan in_chan y x"),
            adecl("b2", IN, "out_chan"),
            adecl("w3", IN, "out_chan in_chan y x"),
            adecl("b3", IN, "out_chan"),
            adecl("out", OUT, "img chan y x")]
    sig_str_keys = ["prec"]
    sig_nda_keys = ["relu_out"]

    @classmethod
    def flops(cls, rfs: OpBase) -> int:
        xd = rfs.get_dims("in")
        Cm = rfs.get_dims("w2")["out_chan"]
        C = xd["chan"]
        return 2 * xd["img"] * xd["y"] * xd["x"] * (C * Cm + 9 * Cm * Cm + Cm * C)

    @classmethod
    def build(cls, rfs: OpBase):
        return build_resblock(rfs)

    @classmethod
    def ref_impl(cls, rfs: OpBase, x, w1, b1, w2, b2, w3, b3):
        from .conv import Conv
        relu_out = rfs.get_u32_or("relu_out", 1) == 1

        def conv_ref(v, w, b, relu, pad):
            op = OpBase({"type": "Convolution", "func_name": "xla_conv"})
            from ...core.dims import Dims
            n_, c_, h_, w_sz = v.shape
            oc = w.shape[0]
            op.set_dims("in", Dims.make(img=n_, chan=c_, y=h_, x=w_sz))
            op.set_dims("filts", Dims.make(out_chan=oc, in_chan=c_,
                                           y=w.shape[2], x=w.shape[3]))
            op.set_dims("biases", Dims.make(out_chan=oc))
            op.set_dims("out", Dims.make(img=n_, chan=oc, y=h_, x=w_sz))
            op.set_null_dims("in_pad", y=pad, x=pad)
            op.set_null_dims("stride", y=1, x=1)
            op.set_null_dims("kern_sz", y=w.shape[2], x=w.shape[3])
            if relu:
                op.set_u32("conv_has_relu", 1)
            rfs2 = Conv.check_args(op)
            return Conv.ref_impl(rfs2, v, w, b)

        h = conv_ref(np.asarray(x), np.asarray(w1), np.asarray(b1), True, 0)
        h = conv_ref(h, np.asarray(w2), np.asarray(b2), True, 1)
        y = conv_ref(h, np.asarray(w3), np.asarray(b3), False, 0)
        y = y + np.asarray(x, y.dtype)
        if relu_out:
            y = np.maximum(y, 0)
        return y.astype(np.asarray(x).dtype)
