"""Loader for the native C++ core library (csrc/ → libboda_tpu_core.so).

The native library provides the performance-critical host paths mirroring
the reference's C++ layers (nda/dims core ops, lexp parse fast path, the
IPC stream transport and worker; see csrc/). Python falls back to the pure
implementations when the library isn't built.
"""

from __future__ import annotations

import ctypes
from functools import lru_cache
from pathlib import Path
from typing import Optional

_LIB_NAMES = ("libboda_tpu_core.so",)


@lru_cache(maxsize=1)
def load_cpp() -> Optional[ctypes.CDLL]:
    root = Path(__file__).resolve().parents[2]
    for sub in ("build", "csrc/build", "."):
        for name in _LIB_NAMES:
            p = root / sub / name
            if p.exists():
                try:
                    return ctypes.CDLL(str(p))
                except OSError:
                    return None
    return None


def cpp_available() -> bool:
    return load_cpp() is not None
