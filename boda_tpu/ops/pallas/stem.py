"""fused_stem: conv1(7x7 s2, bias+ReLU) + maxpool(3x3 s2 ceil) in ONE
Pallas kernel — the ResNet/VGG stem.

Motivation (VERDICT r2 #1a): the stem is the last fusion candidate on the
headline net. XLA runs the plain strided conv1+pool at ~0.86-0.93 ms
isolated (b128), ~32 TF/s effective — thin-channel (C=3) convs waste the
MXU and the conv1 output (112²×64, 12.8 MB/img bf16) makes an HBM round
trip to the pool. This kernel:

  * keeps the whole per-image working set in VMEM (input 294 KB/img):
    the conv1 activation NEVER touches HBM;
  * phase-stacks 2x2 in VMEM (the s2d transform, lane-packing C 3→12 —
    the "lane packing" variant r2 rejected on paper, now measured) so the
    contraction runs as ONE MXU matmul with K = 4·4·12 = 192 instead of
    49 K=3 slivers;
  * fuses bias+ReLU+maxpool before the (56²×64, 400 KB/img) result goes
    back to HBM — stem HBM traffic drops ~4x vs the XLA chain.

Reference role: a cnn_codegen-style fused variant (conv+pool have no
fused CUCL analog; the reference's k1conv write-xpose chaining,
rtc_fwd.cc:495-503, is the same "fold the next op into this kernel's
store" idea). Measured numbers: docs/PERF.md (stem floor table).
"""

from __future__ import annotations

import numpy as np

from ...core.dims import Dims
from ..op_base import OpBase
from ..registry import IN, OUT, KernelTemplate, adecl, template
from .conv import _ConvBase, conv_params
from .pool import Pool
from .sgemm import _dot_precision


def _stem_params(rfs: OpBase):
    ind = rfs.get_dims("in")
    outd = rfs.get_dims("out")
    fd = rfs.get_dims("filts")
    st = rfs.get_dims_or_none("stride")
    pad = rfs.get_dims_or_none("in_pad")
    pk = rfs.get_dims("pool_kern")
    ps = rfs.get_dims("pool_stride")
    pp = rfs.get_dims_or_none("pool_pad")
    return (ind, outd, fd,
            (st["y"], st["x"]) if st else (1, 1),
            (pad["y"], pad["x"]) if pad else (0, 0),
            (pk["y"], pk["x"]), (ps["y"], ps["x"]),
            (pp["y"], pp["x"]) if pp else (0, 0))


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def build_fused_stem(rfs: OpBase):
    import jax
    import jax.numpy as jnp

    from .util import pallas_mode, pallas_call, storage_io
    ind, outd, fd, (sy, sx), (py, px), (pky, pkx), (psy, psx), (ppy, ppx) \
        = _stem_params(rfs)
    assert (sy, sx) == (2, 2), "fused_stem: conv stride 2 only"
    assert (ppy, ppx) == (0, 0), "fused_stem: pool pad 0 only"
    n, C, H, W = ind.shape
    oc = fd["out_chan"]
    k_y, k_x = fd["y"], fd["x"]
    ka, kb = -(-k_y // 2), -(-k_x // 2)
    cy = (H + 2 * py - k_y) // sy + 1          # conv output rows
    cx = (W + 2 * px - k_x) // sx + 1
    oy, ox = outd["y"], outd["x"]
    has_bias = "biases" in rfs.nda_vals
    relu = rfs.get_u32_or("conv_has_relu", 0) == 1
    assert relu, "fused_stem folds ReLU; conv_has_relu must be 1"
    io_nhwc, edt = storage_io(rfs)
    bf16 = rfs.str_vals.get("prec") == "bf16"
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    out_dt = (edt or outd.dtype) if io_nhwc else outd.dtype
    K = ka * kb * 4 * C

    if pallas_mode() == "fallback":
        # fused-jnp equivalent (whole-net CI path off-TPU)
        def fb(x, w, b=None):
            from .conv import S2dConv
            crfs = rfs.copy()
            crfs.set_dims("out", Dims.make(tn=outd.tn, img=n, chan=oc,
                                           y=cy, x=cx))
            y = S2dConv.build(crfs)(x, w, b)
            prfs = OpBase({"type": "Pooling", "func_name": "pool"})
            if io_nhwc:
                prfs.str_vals["io_layout"] = "nhwc"
                if edt is not None:
                    prfs.str_vals["edge_prec"] = "bf16"
            prfs.set_dims("in", Dims.make(tn=outd.tn, img=n, chan=oc,
                                          y=cy, x=cx))
            prfs.set_dims("out", outd)
            prfs.set_null_dims("kern_sz", y=pky, x=pkx)
            prfs.set_null_dims("stride", y=psy, x=psx)
            prfs.set_null_dims("in_pad", y=0, x=0)
            return Pool.build(prfs)(y)
        return fb

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # ---- quad-parity formulation --------------------------------------
    # Mosaic (this version) lowers ALL strided slices to gathers and
    # rejects them, so the kernel uses only contiguous slices:
    #  * outside (XLA, cheap relayout at streaming BW): the padded input
    #    is 2x2 phase-stacked (s2d, C->4C) and then split AGAIN by row/
    #    col parity into four planes S[r][s] — equivalently a 4x4 phase
    #    decomposition of the original image;
    #  * in-kernel: each conv-OUTPUT parity plane C[p][q] (p,q in {0,1})
    #    is one im2col matmul whose 16 taps each read a CONTIGUOUS slice
    #    of one S plane (tap (yy,xx) of C[p][q] reads S[(p+yy)%2][(q+xx)%2]
    #    at row offset (p+yy)//2, col offset (q+xx)//2) — the SAME
    #    (K=16*4C, oc) weight matrix serves all four planes;
    #  * the 3x3 s2 ceil maxpool then needs only contiguous slices of the
    #    C planes: pool (j,i,dy,dx) -> C[dy%2][dx%2][j+dy//2, i+dx//2].
    sub_c = 16 if cdt == jnp.bfloat16 else 8
    KA2 = ka * kb                   # phase-kernel taps (4x4 for k=7)
    # C plane geometry: plane rows a cover conv rows 2a+p < cy
    CPY = -(-cy // 2)               # valid C-plane rows/cols (56 for 112)
    CPX = -(-cx // 2)
    # pool slices take rows/cols [d//2, d//2 + oy) for d in 0..pk-1
    CRY = max(CPY + 1, (pky - 1) // 2 + oy)
    CRX = _ceil_to(max(CPX + 1, (pkx - 1) // 2 + ox), 8)   # f32 sublane
    # S plane geometry: tap offsets up to (1+ka-1)//2, slice rows CRY
    SRO = (1 + ka - 1) // 2         # max row/col offset into S planes
    SRY = CRY + SRO
    # in-kernel col slices: width CW must be sub_c-aligned; the roll
    # normalization wraps co garbage into cols >= SWX-co, so SWX leaves
    # >= sub_c of slack beyond CW+SRO
    CW = _ceil_to(CRX, sub_c)
    SWX = _ceil_to(CW + SRO, sub_c) + sub_c
    M = CRY * CW
    K = KA2 * 4 * C

    def kern(s00_ref, s01_ref, s10_ref, s11_ref, w_ref, b_ref, o_ref):
        from .util import pallas_mode as _pm
        real = _pm() == "real"
        # Mosaic rejects concats whose operands carry different SUBLANE
        # offsets (row/dim0 offsets are fine) and 16-bit rolls — so the
        # im2col assembly runs in f32 with column offsets normalized by
        # pltpu.roll (positive shift), and casts to bf16 only for the dot.
        def colshift(v, co):
            if co == 0:
                return v
            if real:
                return pltpu.roll(v, (SWX - co) % SWX, 1)
            return jnp.concatenate([v[:, co:, :], v[:, :co, :]], axis=1)
        S32 = ((s00_ref[0].astype(jnp.float32), s01_ref[0].astype(jnp.float32)),
               (s10_ref[0].astype(jnp.float32), s11_ref[0].astype(jnp.float32)))
        shifted = {(r_, s_, co): colshift(S32[r_][s_], co)
                   for r_ in (0, 1) for s_ in (0, 1) for co in range(SRO + 1)}
        w = w_ref[...].astype(cdt)
        planes = []
        rmask = jax.lax.broadcasted_iota(jnp.int32, (CRY, CW, 1), 0)
        cmask = jax.lax.broadcasted_iota(jnp.int32, (CRY, CW, 1), 1)
        for p_ in (0, 1):
            row = []
            for q_ in (0, 1):
                cols = []
                for yy in range(ka):
                    for xx in range(kb):
                        ro, co = (p_ + yy) // 2, (q_ + xx) // 2
                        sp = shifted[((p_ + yy) % 2, (q_ + xx) % 2, co)]
                        cols.append(sp[ro:ro + CRY, 0:CW, :])
                a = jnp.concatenate(cols, axis=-1).reshape(M, K)
                acc = jnp.dot(a.astype(cdt), w,
                              preferred_element_type=jnp.float32)
                if has_bias:
                    acc = acc + b_ref[0].astype(jnp.float32)[None, :]
                cp = jnp.maximum(acc, 0.0).reshape(CRY, CW, oc)
                # zero rows/cols whose conv coordinate is out of range
                # (ReLU output >= 0 so zeros are exact for the max)
                nvy = (cy - p_ + 1) // 2     # valid plane rows
                nvx = (cx - q_ + 1) // 2
                cp = jnp.where((rmask < nvy) & (cmask < nvx), cp, 0.0)
                row.append(cp)
            planes.append(row)
        m = None
        for dy in range(pky):
            for dx in range(pkx):
                wnd = planes[dy % 2][dx % 2][dy // 2:dy // 2 + oy,
                                             dx // 2:dx // 2 + ox, :]
                m = wnd if m is None else jnp.maximum(m, wnd)
        o_ref[0] = m.astype(out_dt)

    def fn(x, w, b=None):
        xh = x if io_nhwc else jnp.transpose(x, (0, 2, 3, 1))
        # pad so every S plane covers its slices: s2 rows 2*SRY, cols 2*SWX
        xp = jnp.pad(xh.astype(cdt), ((0, 0), (py, 4 * SRY - H - py),
                                      (px, 4 * SWX - W - px), (0, 0)))
        s2 = jnp.concatenate([xp[:, r::2, s::2, :]
                              for r in (0, 1) for s in (0, 1)], axis=-1)
        Sp = [s2[:, r::2, s::2, :][:, :SRY, :SWX, :]
              for r in (0, 1) for s in (0, 1)]
        ws = []
        for r in (0, 1):
            for s in (0, 1):
                wp = w[:, :, r::2, s::2]
                ws.append(jnp.pad(wp, ((0, 0), (0, 0),
                                       (0, ka - wp.shape[2]),
                                       (0, kb - wp.shape[3]))))
        wmat = jnp.transpose(jnp.concatenate(ws, axis=1),
                             (2, 3, 1, 0)).reshape(K, oc).astype(cdt)
        bv = (b if b is not None else np.zeros((oc,), np.float32)).reshape(1, oc)
        spec_s = pl.BlockSpec((1, SRY, SWX, 4 * C), lambda i: (i, 0, 0, 0))
        out = pallas_call(
            kern,
            grid=(n,),
            in_specs=[spec_s, spec_s, spec_s, spec_s,
                      pl.BlockSpec((K, oc), lambda i: (0, 0)),
                      pl.BlockSpec((1, oc), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((1, oy, ox, oc), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n, oy, ox, oc), np.dtype(out_dt)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * 4 * M * K * oc,
                bytes_accessed=n * (4 * SRY * SWX * 4 * C + oy * ox * oc) * 2,
                transcendentals=0),
        )(*Sp, wmat, jnp.asarray(bv))
        if io_nhwc:
            return out
        return jnp.transpose(out, (0, 3, 1, 2)).astype(outd.dtype)
    return fn


@template
class FusedStem(_ConvBase):
    name = "fused_stem"
    nhwc_ok = True
    args = [adecl("in", IN, "img chan y x"),
            adecl("filts", IN, "out_chan in_chan y x"),
            adecl("biases", IN, "out_chan", opt=True),
            adecl("out", OUT, "img chan y x")]
    sig_nda_keys = ["in_pad", "stride", "kern_sz", "conv_has_relu",
                    "pool_kern", "pool_stride", "pool_pad"]
    sig_str_keys = ["prec", "layout"]

    @classmethod
    def flops(cls, rfs: OpBase) -> int:
        ind, _outd, fd, (sy, sx), (py, px), _pk, _ps, _pp = _stem_params(rfs)
        cy = (ind["y"] + 2 * py - fd["y"]) // sy + 1
        cx = (ind["x"] + 2 * px - fd["x"]) // sx + 1
        return 2 * ind["img"] * cy * cx * fd["out_chan"] * \
            fd["in_chan"] * fd["y"] * fd["x"]

    @classmethod
    def build(cls, rfs: OpBase):
        return build_fused_stem(rfs)

    @classmethod
    def ref_impl(cls, rfs: OpBase, x, w, b=None):
        ind, outd, fd, (sy, sx), (py, px), (pky, pkx), (psy, psx), \
            (ppy, ppx) = _stem_params(rfs)
        cy = (ind["y"] + 2 * py - fd["y"]) // sy + 1
        cx = (ind["x"] + 2 * px - fd["x"]) // sx + 1
        crfs = rfs.copy()
        crfs.set_dims("out", Dims.make(tn=outd.tn, img=ind["img"],
                                       chan=fd["out_chan"], y=cy, x=cx))
        conv = _ConvBase.ref_impl(crfs, x, w, b)  # includes bias+relu
        prfs = OpBase({"type": "Pooling"})
        prfs.set_dims("in", Dims.make(tn=outd.tn, img=ind["img"],
                                      chan=fd["out_chan"], y=cy, x=cx))
        prfs.set_dims("out", outd)
        prfs.set_null_dims("kern_sz", y=pky, x=pkx)
        prfs.set_null_dims("stride", y=psy, x=psx)
        prfs.set_null_dims("in_pad", y=ppy, x=ppx)
        return Pool.ref_impl(prfs, conv)


def make_stem_op(n: int, cin: int, h: int, w: int, cout: int,
                 k: int = 7, s: int = 2, p: int = 3,
                 pool_k: int = 3, pool_s: int = 2,
                 bias: bool = True) -> OpBase:
    cy = (h + 2 * p - k) // s + 1
    cx = (w + 2 * p - k) // s + 1
    oy = -(-(cy - pool_k) // pool_s) + 1
    ox = -(-(cx - pool_k) // pool_s) + 1
    op = OpBase({"type": "fused_stem", "func_name": "fused_stem"})
    op.set_dims("in", Dims.make(img=n, chan=cin, y=h, x=w))
    op.set_dims("filts", Dims.make(out_chan=cout, in_chan=cin, y=k, x=k))
    if bias:
        op.set_dims("biases", Dims.make(out_chan=cout))
    op.set_dims("out", Dims.make(img=n, chan=cout, y=oy, x=ox))
    op.set_null_dims("in_pad", y=p, x=p)
    op.set_null_dims("stride", y=s, x=s)
    op.set_null_dims("kern_sz", y=k, x=k)
    op.set_null_dims("pool_kern", y=pool_k, x=pool_k)
    op.set_null_dims("pool_stride", y=pool_s, x=pool_s)
    op.set_null_dims("pool_pad", y=0, x=0)
    op.set_u32("conv_has_relu", 1)
    return op
