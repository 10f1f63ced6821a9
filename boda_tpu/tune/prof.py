"""Per-op profiling + the ops-prof autotuning sweep driver.

Capability parity with rtc_prof.cc: profile_rcg_call (:44-137 — generate
one op, alloc its args, fill inputs with deterministic gen_data patterns,
run run_iter times with event timing) and mode ops-prof (:140-457 — for
each op in an op-sig file × each named tune × each backend: run, time,
cross-check outputs against the kg tune's full data AND against stored
known-good digests from input wisdom; write merged wisdom).

TPU-era addition: --auto-sweep generates MXU-aligned candidate tunes from
the tile solver instead of requiring hand-listed tunes.
"""

from __future__ import annotations

import sys
from typing import Optional

from ..backend.iface import Backend, RtcFuncCall
from ..core.config import Attr
from ..core.dims import NDA, Dims
from ..core.error import RtErr
from ..core.has_main import HasMain, mode
from ..ops.cnn_variants import OpTune, add_codegen_annotations, make_op_tune
from ..ops.op_base import OpBase, read_op_sigs
from ..ops.registry import Codegen, get_template
from ..testing.comp import comp_digests, comp_vars
from ..core.digest import nda_digest
from .wisdom import (OpWisdom, merge_wisdoms, read_wisdom_file,
                     write_wisdom_file)


def profile_rcg_call(cg: Codegen, op: OpBase, run_iter: int = 5,
                     var_prefix: str = "") -> tuple[float, dict[str, NDA]]:
    """Generate one op instance, alloc+fill args, run run_iter times; return
    (best secs, output tensors). Mirrors profile_rcg_call rtc_prof.cc:44."""
    be = cg.backend
    tmpl = get_template(op.func_name)
    rfs = tmpl.check_args(op)
    inst = cg.gen_func(op)
    args: dict[str, str] = {}
    made: list[str] = []
    try:
        gd = get_template("gen_data")
        i = -1  # pattern index counts PRESENT args, not declared positions:
        # an inserted optional decl (filts_scale) must not shift the test
        # patterns of later args — shipped wisdom artifacts pin kg digests
        # produced under the original in/filts/biases/out numbering
        for a in tmpl.args:
            if a.name not in rfs.nda_vals:
                continue
            dims = rfs.get_dims(a.name)
            if dims.tn == "none":
                continue
            i += 1
            vn = f"{var_prefix}{a.name}"
            if be.var_exists(vn) and be.get_var_dims(vn) != dims:
                # stale var from a prior profiled op (e.g. one whose
                # sweep errored mid-profile) — recreate at these dims
                be.release_var(vn)
            if not be.var_exists(vn):
                be.create_var_with_dims(vn, dims)
                made.append(vn)
            args[a.name] = vn
            if a.kind in ("IN", "INOUT"):
                gop = OpBase({"type": "gen_data", "func_name": "gen_data"})
                gop.set_dims("out", dims)
                gop.set_u32("mode", i % 4)
                gop.nda_vals["scale"] = NDA.scalar(0.1, "float")
                cg.gen_and_run(gop, {"out": vn})
        cg.compile_pend()
        best = None
        for _ in range(max(run_iter, 1)):
            cid = cg.run_func(RtcFuncCall(inst, args))
            be.finish_and_sync()
            dur = be.get_dur(cid, cid)
            best = dur if best is None else min(best, dur)
        outs = {a.name: be.copy_var_to_nda(args[a.name])
                for a in tmpl.args
                if a.kind in ("OUT", "INOUT") and a.name in args}
        if getattr(be, "kind", "") == "xla" and be.get_plat_tag().startswith("xla:tpu"):
            # under the axon tunnel per-call wall timing is unreliable
            # (cached same-input dispatch, non-blocking readiness): re-time
            # with iterations chained inside one XLA program (bench.py
            # methodology). Build under the backend's platform hint — the
            # process-global default backend may differ (gen_func does the
            # same; a bare build could select interpret-mode pallas)
            from ..ops.pallas.util import platform_hint
            dev = getattr(be, "_device", None)
            with platform_hint(dev.platform if dev is not None else None):
                fn = tmpl.build(rfs)
            in_vals = [be.var_device_value(args[a.name])
                       for a in tmpl.args
                       if a.kind in ("IN", "INOUT") and a.name in args]
            best = _chained_secs(fn, in_vals, max(run_iter, 3))
        return best, outs
    finally:
        # ALWAYS release — an errored tune used to leak 'in'/'filts' vars
        # that poisoned every later op's sweep with dim mismatches
        for vn in made:
            be.release_var(vn)


def _chained_secs(fn, in_vals, iters: int, reps: int = 3) -> float:
    """Per-iteration seconds for fn(*in_vals) with a serial dependency
    between iterations (defeats dispatch caching; scalar readback is the
    completion barrier).

    Timing is SLOPE-BASED: run the chain at two lengths n1 < n2 and take
    median (T(n2)-T(n1))/(n2-n1). The axon tunnel adds a large fixed
    per-dispatch cost (~35 ms measured) that total/iters folds into every
    op — round-1's flat '51 TF/s pallas ceiling' was exactly that artifact
    (xla+pallas sgemm both measure 140-190 TF/s slope-timed)."""
    import statistics
    import time

    import jax
    import jax.numpy as jnp

    def chained(args, m):
        x0 = args[0]

        def body(c, _):
            if jnp.issubdtype(x0.dtype, jnp.floating) \
                    or x0.dtype == jnp.bfloat16:
                a0 = x0 + c.astype(x0.dtype)
            else:
                # integer inputs (int8 sgemm / quantized ops) must be
                # perturbed too, or the body is loop-invariant and XLA
                # hoists it out of the scan — the timed work runs ONCE
                # (c stays tiny, so the +0/+1 wobble can't overflow int8)
                a0 = x0 + (c.astype(jnp.int32) % 2).astype(x0.dtype)
            outs = fn(a0, *args[1:])
            o = outs[0] if isinstance(outs, (tuple, list)) else outs
            # consume the WHOLE output: a single-element readback lets
            # XLA's simplifier slice through elementwise producers and
            # dead-code-eliminate the very work being timed
            s = o.ravel().astype(jnp.float32).sum()
            return c + s * 1e-30, s

        c, ys = jax.lax.scan(body, jnp.float32(0), None, length=m)
        return ys.sum()

    ch = jax.jit(chained, static_argnums=1)

    def measure(n1, n2, reps=reps):
        float(ch(in_vals, n1))  # compile + warm
        float(ch(in_vals, n2))
        slopes = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(ch(in_vals, n1))
            t1 = time.perf_counter()
            float(ch(in_vals, n2))
            t2 = time.perf_counter()
            slopes.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
        return statistics.median(slopes)

    n2 = max(iters, 8)
    s = measure(max(2, n2 // 5), n2)
    # adaptive: ops drown in dispatch jitter (~ms-scale through the tunnel)
    # at short chains — lengthen until the n2-n1 span covers enough device
    # work that the slope error is a few percent. A 25 ms/4096-iter cap
    # left µs-scale sgemms (128³..1024³) with garbage (even negative)
    # slopes; scan compile time doesn't grow with length, so a long chain
    # only costs runtime (~4 x span per measure).
    target_span = 250e-3
    for _ in range(3):
        if s > 0 and s * n2 >= target_span:
            break
        if s > 0:
            n2 = min(2_000_000, max(n2 + 1, int(target_span / s)))
        else:
            # invalid slope: no usable per-iter estimate — grow geometrically
            n2 = min(2_000_000, n2 * 64)
        s = measure(max(2, n2 // 5), n2)
    return s


def _op_mnk(op: OpBase):
    """Derive the matmul-shaped (M, N, K) of an op sig, or None."""
    t = op.type
    try:
        if t == "sgemm":
            ad, bd = op.get_dims("a"), op.get_dims("b")
            return ad["M"], bd["N"], ad["K"]
        if t in ("Convolution", "Deconvolution"):
            fd, outd = op.get_dims("filts"), op.get_dims("out")
            return (outd["img"] * outd["y"] * outd["x"], fd["out_chan"],
                    fd["in_chan"] * fd["y"] * fd["x"])
        if t == "InnerProduct":
            ind, fd = op.get_dims("in"), op.get_dims("filts")
            return (ind["img"], fd["out_chan"],
                    fd["in_chan"] * fd.get("y", 1) * fd.get("x", 1))
    except RtErr:
        pass
    return None


def _clip_blocks(dim: int, opts: tuple[int, ...]) -> list[int]:
    """Keep MXU-aligned block candidates that don't exceed the (lane-padded)
    problem dim — sweeping a 512-wide block over a 64-wide dim is waste."""
    lim = max(dim, 128)
    return [0] + [v for v in opts if v <= lim]


def auto_sweep_tunes(op: OpBase, max_tunes: int) -> list[tuple[str, OpTune]]:
    """Generate candidate tunes FROM the op's shape (the gbt_tile role,
    gbt_tile.H:12-68: the reference derived its sweep space from the op's
    M×N work dims rather than a fixed grid). Matmul-shaped ops sweep
    MXU-aligned M/N/K blocks clipped to the problem size; stride-1 convs
    additionally sweep tconv band shapes (work.Mb→TY rows, work.Nb→OCb)
    derived from oy/out_chan; everything sweeps precision."""
    cands: list[tuple[str, OpTune]] = []
    seen: set = set()

    def add(*parts: str) -> None:
        spec = "(" + ",".join(p for p in parts if p) + ")"
        if spec not in seen and len(cands) < max_tunes:
            seen.add(spec)
            cands.append((f"sweep{len(cands)}:{spec}", make_op_tune(spec)))

    mnk = _op_mnk(op)
    if mnk is None:
        for prec in ("", "bf16"):
            add(f"prec={prec}" if prec else "")
        return cands
    M, N, K = mnk
    is_conv = op.type in ("Convolution", "Deconvolution")
    tconv_ok = False
    ty_cands: list[int] = []
    if is_conv:
        st = op.get_dims_or_none("stride")
        fd = op.get_dims("filts")
        outd = op.get_dims("out")
        sy, sx = (st["y"], st["x"]) if st else (1, 1)
        tconv_ok = (op.type == "Convolution" and sy == 1 and sx == 1
                    and fd["y"] <= 11 and fd["x"] <= 11)
        if tconv_ok:
            oy = outd["y"]
            # band heights: whole-plane, halves, and a small fallback —
            # from the op's own output geometry
            ty_cands = sorted({oy, max(1, oy // 2), max(1, oy // 4),
                               min(oy, 4)}, reverse=True)
    for prec in ("", "bf16"):
        p = f"prec={prec}" if prec else ""
        add(p)                                   # solver defaults
        if is_conv:
            add("use_culibs=1", p)               # vendor baseline point
        for Mb in _clip_blocks(M, (256, 512, 1024)):
            for Kb in _clip_blocks(K, (512, 2048)):
                if Mb or Kb:
                    add(f"Mb={Mb},Nb={min(max(N, 128), 512)}" if Mb else "",
                        f"Kb={Kb}" if Kb else "", p)
        if tconv_ok:
            for ty in ty_cands:
                for ocb in _clip_blocks(N, (128, 256))[1:]:
                    add("tconv=1", f"Mb={ty},Nb={ocb}", p)
        if len(cands) >= max_tunes:
            break
    return cands


@mode("ops_prof", help="per-op tuning sweep: time each op x tune x backend, "
                       "cross-check outputs, write wisdom")
class OpsProf(HasMain):
    ops_fn = Attr(str, req=True, help="op-sig list file (one lexp per line)")
    rtcs = Attr(dict[str, Backend], default=None,
                help="named backends, e.g. (tpu=(be=xla),ref=(be=interp))")
    op_tunes = Attr(dict[str, OpTune], default=None,
                    help="named tunes, e.g. (kg=(use_culibs=1),t1=(Mb=256))")
    kg_tune_tag = Attr(str, default="kg", help="tune whose outputs are ground truth")
    auto_sweep = Attr(int, default=0, help="also sweep N generated tunes")
    run_iter = Attr(int, default=5)
    mrd_toler = Attr(float, default=5e-4)
    func_mrd_toler = Attr(dict[str, float], default=None,
                          help="per-func-name tolerance overrides")
    wisdom_in_fn = Attr(str, default="", help="input wisdom (known-good digests)")
    wisdom_out_fn = Attr(str, default="", help="output (merged) wisdom file")
    write_kgs = Attr(bool, default=True, help="record kg digests in output wisdom")

    def main(self):
        ops = read_op_sigs(self.ops_fn)
        rtcs = self.rtcs or {"xla": __import__(
            "boda_tpu.backend.iface", fromlist=["make_backend"]).make_backend("xla")}
        for be in rtcs.values():
            be.ensure_init()
        tunes: dict[str, OpTune] = dict(self.op_tunes or {})
        if self.kg_tune_tag not in tunes:
            tunes[self.kg_tune_tag] = make_op_tune("(use_culibs=1)")
        wis_in: dict = {}
        if self.wisdom_in_fn:
            for w in read_wisdom_file(self.wisdom_in_fn):
                wis_in[w.op._key()] = w
        out_ws: list[OpWisdom] = []
        n_err = 0
        cgs = {bn: Codegen(be) for bn, be in rtcs.items()}
        for op in ops:
            w = OpWisdom(op)
            # the kg tune MUST run first: every other tune is cross-checked
            # against kg_outs, and a user tune ordered before kg would print
            # 'ok' without any output verification
            tune_items = sorted(tunes.items(),
                                key=lambda kv: kv[0] != self.kg_tune_tag)
            if self.auto_sweep:
                tune_items += auto_sweep_tunes(op, self.auto_sweep)
            kg_outs: Optional[dict] = None
            for be_name, be in rtcs.items():
                cg = cgs[be_name]
                plat = be.get_plat_tag()
                for tname, tune in tune_items:
                    top = op.copy()
                    try:
                        add_codegen_annotations(top, tune)
                        secs, outs = profile_rcg_call(cg, top, self.run_iter)
                    except Exception as e:
                        # compile failures (e.g. VMEM OOM from an oversized
                        # tune) are recorded, not fatal — the reference
                        # tagged OOM compile failures the same way
                        # (cnn-prof.cc:99-110)
                        msg = str(e).splitlines()[0][:200]
                        print(f"OP {op.type} tune={tname} be={be_name}: "
                              f"ERROR {type(e).__name__}: {msg}")
                        n_err += 1
                        continue
                    ftol = (self.func_mrd_toler or {}).get(top.func_name, self.mrd_toler)
                    status = "ok"
                    if tname == self.kg_tune_tag and kg_outs is None:
                        kg_outs = outs
                        if self.write_kgs:
                            for an, nda in outs.items():
                                w.kgs.setdefault(an, nda_digest(nda, self_cmp_mrd=ftol))
                    elif kg_outs is not None:
                        errs = comp_vars(kg_outs, outs, ftol)
                        if errs:
                            status = "COMP_FAIL: " + "; ".join(errs)
                            n_err += 1
                    else:
                        # the kg tune itself failed for this op — nothing
                        # to verify against; don't record unverified runs
                        status = "UNVERIFIED (kg tune produced no outputs)"
                    kw = wis_in.get(op._key())
                    if kw is not None and kw.kgs:
                        errs = comp_digests(outs, {k: v for k, v in kw.kgs.items()
                                                   if k in outs}, ftol)
                        if errs:
                            status += " KG_DIGEST_FAIL: " + "; ".join(errs)
                            n_err += 1
                    tmpl = get_template(top.func_name)
                    flops = tmpl.flops(tmpl.check_args(top))
                    gfs = flops / secs / 1e9 if secs else 0.0
                    print(f"OP {op.to_compact_lexp()} tune={tname} be={be_name} "
                          f"func={top.func_name} secs={secs:.3e} GF/s={gfs:.1f} {status}")
                    if status == "ok":
                        # wisdom records only VERIFIED timings: best_tune
                        # selects by min secs, so a fast-but-wrong tune
                        # (COMP_FAIL) must never enter the store
                        w.tune(str(tune.to_lexp())).add_run(plat, secs)
            out_ws.append(w)
        if self.wisdom_out_fn:
            merged = merge_wisdoms([list(wis_in.values()), out_ws]) if wis_in else out_ws
            write_wisdom_file(self.out_path(self.wisdom_out_fn), merged)
            print(f"wrote wisdom for {len(merged)} ops to {self.wisdom_out_fn}")
        if n_err:
            raise RtErr(f"ops_prof: {n_err} errors/comparison failures")
