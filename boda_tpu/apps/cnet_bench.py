"""cnet_bench: slope-timed whole-net throughput benchmark for any model.

Generalizes bench.py (the driver's headline harness) into a CLI mode:
build any zoo/prototxt model, lower it with a tune (default: the shipped
perf config — fused NHWC/bf16-edge storage), chain iterations inside one
XLA program via a dynamic-length fori_loop, and report the slope between
two chain lengths (the tunnel-honest methodology, ROUND2_NOTES.md).

Reference role: the whole-net half of cnn-prof (`cnn_prof`,
cnn-prof.cc:133) — per-net secs/imgs-per-sec/%-of-peak reporting.
"""

from __future__ import annotations

from ..core.config import Attr
from ..core.has_main import mode
from ..graph.modes import _NetMode
from ..ops.cnn_variants import OpTune

from ..core.machine import peak_flops  # single definition site (core/machine.py)


def chained_net_secs(fwd, weights, x, iters: int, n1: int = 0, reps: int = 3):
    """Per-forward seconds: serial fori_loop chain, slope of two lengths."""
    import statistics
    import time

    import jax
    import jax.numpy as jnp

    iters = max(iters, 3)
    n1 = n1 or max(2, iters // 5)
    n1 = min(n1, iters - 1)

    def chained(w, x, n):
        def body(_i, carry):
            c, acc = carry
            p = fwd({"data": c}, w)["prob"]
            return c + p.sum().astype(c.dtype) * 1e-12, acc + p.ravel()[0]
        _c, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
        return acc

    fn = jax.jit(chained)
    dev = jax.devices()[0]
    w_dev = {k: jax.device_put(v, dev) for k, v in weights.items()}
    x_dev = jax.device_put(x, dev)
    t0 = time.perf_counter()
    float(fn(w_dev, x_dev, 1))
    compile_s = time.perf_counter() - t0
    float(fn(w_dev, x_dev, n1))
    float(fn(w_dev, x_dev, iters))
    slopes = []
    for _ in range(reps):
        a = time.perf_counter()
        float(fn(w_dev, x_dev, n1))
        b = time.perf_counter()
        float(fn(w_dev, x_dev, iters))
        c = time.perf_counter()
        slopes.append(((c - b) - (b - a)) / (iters - n1))
    return statistics.median(slopes), compile_s


@mode("cnet_tune", help="whole-net tune search: sweep tune records, pick best")
class CnetTune(_NetMode):
    """Whole-net autotuning (TPU-first addition: the reference's wisdom
    sweep is per-op; net-level knobs — layout/edge storage/first-layer
    transform — interact through XLA fusion, e.g. s2d wins per-op but
    loses under NHWC storage, ROUND2_NOTES). Sweeps tune records with the
    chained-slope harness and reports/records the winner."""

    tunes = Attr(list[str], default=None,
                 help="tune records to sweep (default: a storage/layout/"
                      "s2d grid over the vendor kernels)")
    batches = Attr(list[int], default=None,
                   help="also sweep batch sizes (default: just --batch)")
    iters = Attr(int, default=30)
    reps = Attr(int, default=3)
    wisdom_out_fn = Attr(str, default="", help="write winner tune here")

    DEFAULT_TUNES = [
        "(use_culibs=1,prec=bf16,layout=nhwc,s2d=0)",
        "(use_culibs=1,prec=bf16,layout=nhwc)",
        "(use_culibs=1,prec=bf16,layout=nhwc,edge_prec=f32,s2d=0)",
        "(use_culibs=1,prec=bf16)",
    ]

    def main(self):
        import numpy as np

        from ..backend.xla import enable_compilation_cache
        from ..engine.lower import lower_pipe
        from ..engine.rtc_fwd import build_fused_forward
        from ..graph.modes import _load_pipe
        from ..ops.cnn_variants import make_op_tune

        enable_compilation_cache()
        results = []  # (imgs_per_sec, batch, tune)
        for bsz in (self.batches or [self.batch]):
            self.batch = bsz
            pipe = _load_pipe(self)
            d = pipe.get_data_img_dims()
            x = (np.random.RandomState(0).randn(*d.shape) * 0.1
                 ).astype(np.float32)
            fl, _ = pipe.total_flops_and_bytes()
            for ts in (self.tunes or self.DEFAULT_TUNES):
                plan = lower_pipe(pipe, make_op_tune(ts), fused_storage=True)
                fwd = build_fused_forward(plan)
                weights = {n: pipe.op_params[n].v for n in plan.weight_nodes}
                secs, _c = chained_net_secs(fwd, weights, x, self.iters,
                                            reps=self.reps)
                ips = d["img"] / secs
                results.append((ips, bsz, ts))
                print(f"b{bsz} tune {ts}: step_ms={secs * 1e3:.2f} "
                      f"imgs_per_sec={ips:.1f} "
                      f"tflops={fl / secs / 1e12:.1f}", flush=True)
        results.sort(key=lambda r: -r[0])
        best_ips, best_b, best = results[0]
        print(f"best: batch={best_b} tune={best} "
              f"(imgs_per_sec={best_ips:.1f})")
        if self.wisdom_out_fn:
            with open(self.out_path(self.wisdom_out_fn), "w") as f:
                f.write(f"(model={self.model},batch={best_b},tune={best})\n")


@mode("cnet_bench", help="slope-timed whole-net throughput benchmark")
class CnetBench(_NetMode):
    op_tune = Attr(OpTune,
                   default="(use_culibs=1,prec=bf16,layout=nhwc,s2d=0)",
                   help="tune record (default: shipped perf config)")
    wisdom_fn = Attr(str, default="", help="per-op wisdom overrides "
                     "(ops_prof output; sigs must match this batch)")
    op_tunes_pat = Attr(dict[str, str], default=None,
                        help="per-op tune overrides by TAG REGEX, e.g. "
                             "(res2.*=(use_culibs=1,prec=bf16,layout=nhwc,"
                             "quant8=1)) — selective-stage experiments")
    iters = Attr(int, default=30, help="long chain length")
    reps = Attr(int, default=3, help="slope repetitions (median)")

    def _pat_tunes(self, pipe):
        import re

        from ..ops.cnn_variants import make_op_tune
        out = {}
        for pat, spec in self.op_tunes_pat.items():
            rx = re.compile(pat)
            t = make_op_tune(spec)
            for op in pipe.ops.values():
                if rx.fullmatch(op.tag):
                    out[op.tag] = t
        print(f"op_tunes_pat: tuned {len(out)} op(s)", flush=True)
        return out or None

    def _wisdom_tunes(self, pipe):
        from ..backend.iface import make_backend
        from ..ops.cnn_variants import make_op_tune
        from ..tune.wisdom import load_tune_index, wisdom_key
        be = make_backend("xla")
        be.init()
        plat = be.get_plat_tag()
        idx = load_tune_index(self.wisdom_fn, plat)
        idx_any = load_tune_index(self.wisdom_fn, "")
        out = {}
        for op in pipe.ops.values():
            ts = idx.get(wisdom_key(op)) or idx_any.get(wisdom_key(op))
            if ts is not None:
                out[op.tag] = make_op_tune(ts)
        print(f"wisdom: tuned {len(out)} op(s) from {self.wisdom_fn}",
              flush=True)
        return out or None

    def main(self):
        import numpy as np

        from ..backend.xla import enable_compilation_cache
        from ..engine.lower import lower_pipe
        from ..engine.rtc_fwd import build_fused_forward
        from ..graph.modes import _load_pipe

        enable_compilation_cache()
        pipe = _load_pipe(self)
        op_tunes = self._wisdom_tunes(pipe) if self.wisdom_fn else None
        if self.op_tunes_pat:
            op_tunes = {**(op_tunes or {}), **(self._pat_tunes(pipe) or {})}
        plan = lower_pipe(pipe, self.op_tune, op_tunes=op_tunes,
                          fused_storage=True)
        fwd = build_fused_forward(plan)
        weights = {n: pipe.op_params[n].v for n in plan.weight_nodes}
        d = pipe.get_data_img_dims()
        x = (np.random.RandomState(0).randn(*d.shape) * 0.1).astype(np.float32)

        secs, compile_s = chained_net_secs(fwd, weights, x, self.iters,
                                           reps=self.reps)
        import jax
        dev = jax.devices()[0]
        prec = self.op_tune.prec or "f32"
        fl, _ = pipe.total_flops_and_bytes()
        pk = peak_flops(dev.device_kind, prec)
        name = self.model or self.ptt_fn
        print(f"cnet_bench {name} b{d['img']} {prec} "
              f"storage={'nhwc' if plan.storage_nhwc else 'nchw'}: "
              f"step_ms={secs * 1e3:.2f} imgs_per_sec={d['img'] / secs:.1f} "
              f"tflops={fl / secs / 1e12:.1f} "
              f"frac_roofline={fl / secs / pk:.4f} "
              f"compile_s={compile_s:.1f} device={dev.device_kind}")
