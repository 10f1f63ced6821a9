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

import contextlib
import contextvars
import os

# set by Codegen while building kernels for a specific backend device:
# under the axon tunnel jax.default_backend() stays "tpu" even when a
# backend explicitly targets CPU devices, so the global default lies
_platform_hint: contextvars.ContextVar = contextvars.ContextVar(
    "boda_pallas_platform_hint", default=None)


@contextlib.contextmanager
def platform_hint(platform):
    tok = _platform_hint.set(platform)
    try:
        yield
    finally:
        _platform_hint.reset(tok)


def pallas_mode() -> str:
    env = os.environ.get("BODA_PALLAS_MODE")
    if env in ("real", "interpret", "fallback"):
        return env
    hint = _platform_hint.get()
    if hint is not None:
        return "real" if hint == "tpu" else "fallback"
    import jax
    try:
        return "real" if jax.default_backend() == "tpu" else "fallback"
    except Exception:
        return "fallback"


def storage_io(rfs):
    """(io_nhwc, edge_dtype_or_None) from a reduced sig.

    The fused-storage pass (engine/lower.py) marks every step with
    io_layout=nhwc (+ edge_prec=bf16 under prec=bf16): templates then
    consume/produce NHWC storage tensors directly — no per-op wrapping
    transposes — and keep inter-op edges in the compute dtype (one HBM
    round-trip in bf16 instead of f32: ResNet-50 is HBM-bound, so edge
    storage is the dominant whole-net cost)."""
    import jax.numpy as jnp
    nhwc = rfs.str_vals.get("io_layout") == "nhwc"
    edt = jnp.bfloat16 if rfs.str_vals.get("edge_prec") == "bf16" else None
    return nhwc, edt


def pallas_call(kernel, **kw):
    from jax.experimental import pallas as pl
    if pallas_mode() == "interpret":
        kw.pop("compiler_params", None)
        kw["interpret"] = True
    return pl.pallas_call(kernel, **kw)
