"""tconv: spatial-tiled direct convolution as a Pallas kernel.

Reference parity: tconv.cucl — the reference's spatial-tiled conv variant
(multi-image line blocking, cnn_op.cc:158-192), redesigned for TPU as
SURVEY.md §7 prescribes: a grid over (img, y-tiles, out_chan-blocks) where
each step DMAs one haloed input row-band HBM→VMEM and accumulates the
ky·kx filter taps as (TY·ox, C) x (C, OCb) MXU matmuls in f32 — the im2col
matrix never materializes (unlike the `conv` template, which builds it in
HBM and feeds the generic matmul).

Constraints: stride 1 only (the variant gate in cnn_variants falls back to
`conv`/`xla_conv` otherwise — the reference gated tconv by kernel size the
same way, cnn_op.cc:46-68).

Tuning knobs (reference tconv blocking ≈): work.Mb → TY (output rows per
tile), work.Nb → OCb (out_chan block).
"""

from __future__ import annotations

import numpy as np

from ...core.dims import Dims
from ..op_base import OpBase
from ..registry import template
from .conv import _ConvBase, conv_params
from .sgemm import _dot_precision


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def _pick_tiles(oy: int, ox: int, Wp: int, C: int, oc: int, ky: int,
                dt_size: int, Mb: int = 0, Nb: int = 0) -> tuple[int, int]:
    """(TY, OCb): output rows per tile and out_chan block, VMEM-bounded.

    The budget counts the WHOLE per-step working set, not just the input
    band: the per-tap (TY·ox, C) a-matrices + the f32 acc are what
    actually blow the 16MB scoped-vmem stack (vgg conv3 at f32 hit
    18.95M with the old input-band-only estimate). Explicit Mb/Nb tuning
    overrides are honored unclamped (sweeps record compile OOMs and move
    on, reference cnn-prof.cc:99-110 behavior)."""
    OCb = Nb or min(_ceil_to(oc, 128), 256)
    if Mb:
        return Mb, OCb

    def est(ty):
        band = (ty + ky - 1) * Wp * C * dt_size          # DMA scratch
        a = ty * ox * C * dt_size                        # live tap matrix
        acc = ty * ox * OCb * 4                          # f32 accumulator
        w = ky * ky * C * OCb * dt_size                  # filter block
        out = ty * ox * OCb * dt_size                    # output block
        return band + 2 * a + acc + 2 * w + 2 * out

    TY = max(1, min(oy, 2048 // max(ox, 1)))
    while TY > 1 and est(TY) > 9 * 1024 * 1024:
        TY //= 2
    return TY, OCb


def build_tconv(rfs: OpBase):
    import jax
    import jax.numpy as jnp

    from .util import pallas_call, pallas_mode

    from .util import storage_io

    ind, outd, fd, sy, sx, py, px, relu = conv_params(rfs)
    assert sy == 1 and sx == 1, "tconv requires stride 1"
    n, C, H, W = ind.shape
    oc, ic, ky, kx = fd["out_chan"], fd["in_chan"], fd["y"], fd["x"]
    oy, ox = outd["y"], outd["x"]
    has_bias = "biases" in rfs.nda_vals
    bf16 = rfs.str_vals.get("prec") == "bf16"
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    io_nhwc, edt = storage_io(rfs)
    out_dt = (edt or outd.dtype) if io_nhwc else outd.dtype

    if pallas_mode() == "fallback":
        # off-TPU whole-net CI path: same math via XLA conv
        def fb(x, w, b=None):
            xc = x.astype(cdt)
            wc = w.astype(cdt)
            if io_nhwc:
                y = jax.lax.conv_general_dilated(
                    xc, jnp.transpose(wc, (2, 3, 1, 0)), window_strides=(1, 1),
                    padding=((py, py), (px, px)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                    precision=_dot_precision(xc.dtype))
                if has_bias and b is not None:
                    y = y + b.astype(y.dtype)[None, None, None, :]
                if relu:
                    y = jnp.maximum(y, 0)
                return y.astype(out_dt)
            y = jax.lax.conv_general_dilated(
                xc, wc, window_strides=(1, 1), padding=((py, py), (px, px)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32,
                precision=_dot_precision(xc.dtype))
            if has_bias and b is not None:
                y = y + b.astype(y.dtype)[None, :, None, None]
            if relu:
                y = jnp.maximum(y, 0)
            return y.astype(out_dt)
        return fb

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    wk = rfs.get_dims_or_none("work")
    # sublane (second-minor) slice shapes must be tile-aligned on TPU:
    # 8 rows for f32, 16 for packed bf16 (Mosaic tiling constraint)
    sub_al = 16 if bf16 else 8
    # lane-dim (in_chan) padding: Mosaic fails to compile this kernel for
    # C % 128 != 0 (tunnel-side tpu_compile crash, round-2 sweep); pad the
    # band + filters to the next 128-multiple so the tuner can sweep tconv
    # on every sig (VERDICT r1 #6) — wasted lanes, but e.g. C=256 tconv
    # still beat xla_conv 2x, so the tradeoff is per-op wisdom's call
    Cl = C
    C = _ceil_to(C, 128)
    OXA = _ceil_to(ox, sub_al)     # aligned out-column count per band
    Wp = _ceil_to(OXA + kx - 1, sub_al)
    TY, OCb = _pick_tiles(oy, OXA, Wp, C, oc, ky,
                          2 if bf16 else 4,
                          Mb=wk.get("Mb", 0) if wk else 0,
                          Nb=wk.get("Nb", 0) if wk else 0)
    ny = -(-oy // TY)
    OCp = _ceil_to(oc, OCb)
    Hp = ny * TY + ky - 1          # enough rows for every haloed band
    TYI = TY + ky - 1

    def kern(x_hbm, w_ref, *rest):
        if has_bias:
            b_ref, o_ref, x_scr, sem = rest
        else:
            o_ref, x_scr, sem = rest
        b = pl.program_id(0)
        t = pl.program_id(1)
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _dma():
            cp = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(t * TY, TYI)], x_scr, sem)
            cp.start()
            cp.wait()

        acc = jnp.zeros((TY * OXA, OCb), jnp.float32)
        for yy in range(ky):
            for xx in range(kx):
                a = x_scr[yy:yy + TY, xx:xx + OXA, :].reshape(TY * OXA, C)
                wt = w_ref[yy, xx]  # (C, OCb)
                acc = acc + jnp.dot(a, wt, preferred_element_type=jnp.float32)
        if has_bias:
            acc = acc + b_ref[0].astype(jnp.float32)[None, :]
        if relu:
            acc = jnp.maximum(acc, 0)
        o_ref[0] = acc.reshape(TY, OXA, OCb).astype(o_ref.dtype)

    grid = (n, ny, OCp // OCb)
    w_spec = pl.BlockSpec((ky, kx, C, OCb), lambda b, t, j: (0, 0, 0, j))
    b_spec = pl.BlockSpec((1, OCb), lambda b, t, j: (0, j))
    o_spec = pl.BlockSpec((1, TY, OXA, OCb), lambda b, t, j: (b, t, 0, j))
    in_specs = [pl.BlockSpec(memory_space=pl.ANY), w_spec]
    if has_bias:
        in_specs.append(b_spec)

    call = pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((n, ny * TY, OXA, OCp), np.dtype(out_dt)),
        scratch_shapes=[pltpu.VMEM((TYI, Wp, C), cdt),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * oy * ox * oc * C * ky * kx,
            bytes_accessed=n * Hp * Wp * C * (2 if bf16 else 4)
                           + ky * kx * C * OCp * (2 if bf16 else 4)
                           + n * oy * ox * OCp * np.dtype(out_dt).itemsize,
            transcendentals=0),
    )

    def fn(x, w, b=None):
        xc = x.astype(cdt)
        # NHWC band layout, padded to (Hp, Wp); conv padding included
        xh = xc if io_nhwc else jnp.transpose(xc, (0, 2, 3, 1))
        xh = jnp.pad(xh, ((0, 0), (py, Hp - H - py), (px, Wp - W - px),
                          (0, C - Cl)))
        wh = jnp.transpose(w.astype(cdt), (2, 3, 1, 0))  # (ky,kx,C,oc)
        wh = jnp.pad(wh, ((0, 0), (0, 0), (0, C - Cl), (0, OCp - oc)))
        args = [xh, wh]
        if has_bias:
            bv = jnp.pad(b.astype(cdt), (0, OCp - oc)).reshape(1, OCp)
            args.append(bv)
        y = call(*args)  # (n, ny*TY, OXA, OCp)
        y = y[:, :oy, :ox, :oc]
        if io_nhwc:
            return y.astype(out_dt)
        return jnp.transpose(y, (0, 3, 1, 2))
    return fn


@template
class TConv(_ConvBase):
    """Spatial-tiled direct conv (see module docstring)."""

    name = "tconv"
    nhwc_ok = True

    @classmethod
    def build(cls, rfs: OpBase):
        return build_tconv(rfs)
