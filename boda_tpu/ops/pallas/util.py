"""Shared Pallas helpers: kernel execution-mode policy.

Modes (env BODA_PALLAS_MODE overrides):
  real      — compile Pallas via Mosaic (TPU hardware; the perf path)
  interpret — pl.pallas_call(interpret=True): exact, used by op-level CI
              tests to exercise kernel bodies off-TPU
  fallback  — skip Pallas, use the template's fused-jnp equivalent: whole-
              net CI tests off-TPU (Pallas interpret inside one big jit
              multiplies XLA compile time past usability)

Default: real on TPU, fallback elsewhere.
"""

from __future__ import annotations

import os


def pallas_mode() -> str:
    env = os.environ.get("BODA_PALLAS_MODE")
    if env in ("real", "interpret", "fallback"):
        return env
    import jax
    try:
        return "real" if jax.default_backend() == "tpu" else "fallback"
    except Exception:
        return "fallback"


def pallas_call(kernel, **kw):
    from jax.experimental import pallas as pl
    if pallas_mode() == "interpret":
        kw.pop("compiler_params", None)
        kw["interpret"] = True
    return pl.pallas_call(kernel, **kw)
