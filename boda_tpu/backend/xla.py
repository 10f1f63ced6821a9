"""XLA backend: JAX on TPU (or CPU) — the nvrtc backend's TPU-native analog.

Capability parity with nvrtc_compute_t (nvrtc_util.cc:174): device context
init, AOT batch compilation of generated functions (nvrtcCompile→module load
becomes jit→lower→compile against fixed shapes), named device vars in HBM,
per-call timing, optional generated-source dump (here: StableHLO text), and
get_plat_tag() = platform + device kind, used as the wisdom/tuning key
(nvrtc_util.cc:206-214).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..core.config import Attr, register
from ..core.dims import Dims
from ..core.error import RtErr
from .iface import Backend, CompiledFunc


_CACHE_DIR = str(Path.home() / ".cache" / "boda_tpu" / "xla_cache")


def enable_compilation_cache(cache_dir: str = "") -> None:
    """Turn on JAX's persistent compilation cache (idempotent).

    TPU compiles through the axon tunnel cost 100-300 s for the big fused
    programs (BENCH_r01 compile_s=256); a disk cache makes re-runs of
    bench/tests/tuning sweeps pay that once per program, not once per
    process. Low thresholds: even 1-2 s kernels are worth caching given
    per-compile tunnel latency."""
    import jax
    d = cache_dir or _CACHE_DIR
    try:
        # TPU only: XLA:CPU AOT entries reload with machine-feature
        # mismatch warnings on other hosts (ROUND2_NOTES), and CPU
        # compiles are cheap anyway
        if jax.default_backend() != "tpu":
            return
        Path(d).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # threshold 0: the axon tunnel compiles server-side, so the
        # client-measured compile time is ~0 and any positive threshold
        # filters out everything (including 300s-wall fused programs)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: run uncached


@register(Backend, "xla", help="JAX/XLA backend (TPU or CPU)")
class XlaBackend(Backend):
    kind = "xla"
    device_ordinal = Attr(int, default=0, help="jax device index to use")
    platform = Attr(str, default="", help="force jax platform (tpu/cpu); default auto")

    def init(self) -> None:
        import jax
        import os
        plat = self.platform
        if not plat:
            # honor JAX_PLATFORMS from the environment: the axon TPU plugin
            # stays the default backend even when JAX_PLATFORMS=cpu is set,
            # so an explicit devices() query is needed to actually get CPU
            envp = os.environ.get("JAX_PLATFORMS", "")
            if envp and "," not in envp:
                plat = envp
        devs = jax.devices(plat) if plat else jax.devices()
        if devs and devs[0].platform == "tpu":
            # TPU only: XLA:CPU AOT cache entries reload with machine-feature
            # mismatch warnings (SIGILL risk); TPU entries are the ones worth
            # 100-300 s of tunnel compile anyway
            enable_compilation_cache()
        if self.device_ordinal >= len(devs):
            raise RtErr(f"device ordinal {self.device_ordinal} out of range "
                        f"({len(devs)} devices)")
        self._device = devs[self.device_ordinal]
        self._jax = jax
        self._initialized = True

    def get_plat_tag(self) -> str:
        self.ensure_init()
        return f"xla:{self._device.platform}:{self._device.device_kind}"

    # ---- impl hooks ----
    def _alloc(self, dims: Dims):
        import jax.numpy as jnp
        dt = dims.dtype
        if dt is None:
            raise RtErr(f"can't allocate var with tn=none dims {dims}")
        with self._jax.default_device(self._device):
            return jnp.zeros(dims.shape, dtype=dt)

    def _to_device(self, v):
        return self._jax.device_put(np.asarray(v), self._device)

    def _to_host(self, v):
        return np.asarray(v)

    def _block_on(self, outs) -> None:
        for o in outs:
            if hasattr(o, "block_until_ready"):
                o.block_until_ready()
        # under the axon tunnel block_until_ready() does not actually block;
        # force a 1-element device->host read as a real completion barrier
        if outs and self._device.platform == "tpu":
            o = outs[-1]
            if hasattr(o, "ndim") and o.ndim >= 0:
                np.asarray(o[(0,) * o.ndim])

    def _compile_one(self, f: CompiledFunc) -> None:
        jax = self._jax
        specs = [jax.ShapeDtypeStruct(d.shape, d.dtype) for _n, d in f.in_specs]
        jitted = jax.jit(f.fn)
        try:
            # pin lowering to this backend's device — the process default
            # may be a different platform (axon TPU plugin vs forced CPU)
            with jax.default_device(self._device):
                lowered = jitted.lower(*specs)
        except Exception as e:
            raise RtErr(f"compile of '{f.name}' failed at lowering: {e}") from e
        if self.gen_src:
            p = Path(self.gen_src_output_dir)
            p.mkdir(parents=True, exist_ok=True)
            (p / f"{f.name}.stablehlo.txt").write_text(lowered.as_text())
        try:
            compiled = lowered.compile()
        except Exception as e:
            raise RtErr(f"compile of '{f.name}' failed: {e}") from e
        f.fn = compiled

    def profile_start(self) -> None:
        import jax
        self._trace_dir = Path(self.gen_src_output_dir) / "jax_trace"
        jax.profiler.start_trace(str(self._trace_dir))

    def profile_stop(self) -> None:
        import jax
        jax.profiler.stop_trace()
