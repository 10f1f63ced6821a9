"""Tile-shape solver: the gbt_tile_t analog for MXU/VPU geometry.

The reference solved an M×N work space into blocks×threads×per-thread tiles
with a waste-bounded divisor search (gbt_tile.H:12-68). On TPU the targets
are fixed by hardware: MXU 128×128 systolic array, VPU 8×128 lanes, and
dtype-dependent minimum tiles (f32 (8,128), bf16 (16,128)). The solver picks
Pallas block shapes that (a) align to those tiles, (b) divide the (possibly
padded) problem, and (c) bound padding waste — and reports the padded dims
so callers can insert pad/unpad.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

MXU = 128
LANE = 128


def sublane(dtype) -> int:
    """Minimum second-to-last tile dim for dtype."""
    it = np.dtype(dtype).itemsize if not _is_bf16(dtype) else 2
    return {4: 8, 2: 16, 1: 32}.get(it, 8)


def _is_bf16(dtype) -> bool:
    return str(np.dtype(dtype)) == "bfloat16" or str(dtype) == "bfloat16"


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pick_block(sz: int, target: int, align: int, max_waste: float = 0.25) -> int:
    """Pick a block size for a dim of size `sz`: the largest multiple of
    `align` that is ≤ target and wastes ≤ max_waste of the padded extent;
    small dims round up to one aligned block."""
    if sz <= align:
        return align
    best = align
    b = align
    while b <= target and b <= round_up(sz, align):
        padded = round_up(sz, b)
        waste = (padded - sz) / padded
        if waste <= max_waste:
            best = b
        b += align
    return best


@dataclass
class MatmulTiles:
    Mb: int
    Nb: int
    Kb: int
    Mp: int  # padded dims
    Np: int
    Kp: int

    @property
    def grid(self) -> tuple[int, int, int]:
        return (self.Mp // self.Mb, self.Np // self.Nb, self.Kp // self.Kb)

    def needs_pad(self, M: int, N: int, K: int) -> bool:
        return (self.Mp, self.Np, self.Kp) != (M, N, K)


def solve_matmul_tiles(M: int, N: int, K: int, dtype="float32",
                       Mb: int = 0, Nb: int = 0, Kb: int = 0,
                       vmem_budget: int = 8 * 2 ** 20) -> MatmulTiles:
    """Choose MXU-aligned (Mb,Nb,Kb) blocks for an M×N×K matmul.

    Explicit non-zero Mb/Nb/Kb are honored (tuning override path); otherwise
    defaults favor large MXU-aligned blocks bounded by a VMEM budget:
    a/b/out blocks count double (Pallas pipeline double-buffering) plus the
    f32 accumulator (the 16MB scoped-vmem hardware cap minus compiler temporaries — Kb=1024+
    f32 blocks were observed to OOM at 14MB estimates).
    """
    sl = sublane(dtype)
    isz = 2 if _is_bf16(dtype) else np.dtype(dtype).itemsize
    # explicit overrides are rounded UP to hardware tiling (Pallas rejects
    # blocks whose last two dims aren't sublane/lane multiples — a tconv
    # band candidate like Mb=14 landing on the matmul path must not turn
    # into a guaranteed-invalid compile)
    Mb = round_up(Mb, sl) if Mb else pick_block(M, 512, max(MXU, sl))
    Nb = round_up(Nb, LANE) if Nb else pick_block(N, 512, LANE)
    Kb = round_up(Kb, LANE) if Kb else pick_block(K, 2048, LANE)
    # shrink K block first, then M/N, until VMEM fits
    def vmem(mb, nb, kb):
        return 2 * (mb * kb + kb * nb + mb * nb) * isz + mb * nb * 4
    while vmem(Mb, Nb, Kb) > vmem_budget and Kb > LANE:
        Kb //= 2
    while vmem(Mb, Nb, Kb) > vmem_budget and (Mb > MXU or Nb > LANE):
        if Mb >= Nb and Mb > MXU:
            Mb //= 2
        elif Nb > LANE:
            Nb //= 2
        else:
            break
    Mb = max(Mb, sl)
    return MatmulTiles(Mb, Nb, Kb, round_up(M, Mb), round_up(N, Nb), round_up(K, Kb))


def solve_ew_block(shape: tuple[int, ...], dtype="float32") -> tuple[int, ...]:
    """Block shape for elementwise kernels: flatten-to-2D guidance — callers
    reshape to (rows, lanes); we pick an (r, LANE·k) block."""
    n = math.prod(shape)
    lanes = LANE
    rows = max(1, min(1024, n // lanes))
    return (rows, lanes)
