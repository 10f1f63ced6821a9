"""Shared Pallas helpers.

`pallas_call` wraps pl.pallas_call, switching to interpreter mode off-TPU
(CI/tests run on CPU where Mosaic compilation is an emulation path that is
both slow and numerically TPU-like; the interpreter is fast and exact).
Override with BODA_PALLAS_INTERPRET=0/1.
"""

from __future__ import annotations

import os
from functools import lru_cache


@lru_cache(maxsize=1)
def use_interpret() -> bool:
    env = os.environ.get("BODA_PALLAS_INTERPRET")
    if env is not None:
        return env not in ("0", "false")
    import jax
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def pallas_call(kernel, **kw):
    from jax.experimental import pallas as pl
    if use_interpret():
        kw.pop("compiler_params", None)
        kw["interpret"] = True
    return pl.pallas_call(kernel, **kw)
