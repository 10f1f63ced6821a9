"""Single source of truth for the device machine model.

The reference hardcoded its machine model in one place per tool
(peak_flops=6600e9 in cnn-prof.cc:36, --peak-flops overrides for other
devices, doc/sgemm-notes.txt:54); round 1-2 of this repo scattered peak /
bandwidth constants across bench.py, cnet_bench.py, opinfo.py, plots.py
with stale values (the 819 GB/s v5e *spec* number vs the ~1.4 TB/s
*measured* streaming rate). This module owns both the spec table and the
measured corrections (ROUND2_NOTES.md "Corrected machine model"); every
consumer (bench.py, cnet_bench, cnn_op_info, roofline_plot, docs) reads
from here.

Measured numbers are from this repo's own probes on the one real chip
(slope-timed, bwai + step-cost ablations):
  * XLA streaming: ~1.4 TB/s combined HBM traffic (NOT the 819 GB/s v5e
    spec) → roofline knee ≈ 140 flops/byte at bf16 peak.
  * Pallas manual-DMA payload: flat ~330 GB/s wall regardless of chunk
    size or grid steps.
  * Pallas multi-op kernel bodies: ~75-82 TF/s where XLA runs 126-146.
  * axon tunnel: ~35-39 ms FIXED dispatch+readback per call (all timing
    must be slope-based; see tune/prof._chained_secs).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class MachineModel:
    device_kind: str
    prec: str
    peak_flops: float          # MXU peak for `prec` [FLOP/s]
    hbm_bw_spec: float         # vendor spec HBM bandwidth [B/s]
    hbm_bw_measured: float     # measured XLA streaming traffic rate [B/s]
    pallas_dma_bw: float       # measured Pallas manual-DMA payload wall [B/s]
    pallas_compute: float      # measured Pallas multi-op kernel rate [FLOP/s]
    dispatch_secs: float       # fixed per-call dispatch+readback cost [s]
    measured: bool             # True when the measured columns are real

    @property
    def hbm_bw(self) -> float:
        """Bandwidth to use for roofline knees: measured when available."""
        return self.hbm_bw_measured or self.hbm_bw_spec

    @property
    def roofline_knee(self) -> float:
        """Arithmetic intensity [flops/byte] where an op goes compute-bound."""
        return self.peak_flops / self.hbm_bw


# (device-kind prefix, prec) -> peak FLOP/s.  v5e: 394 int8 / 197 bf16 /
# 49 f32 (spec sheet ratios); measured columns are the ROUND2 numbers for
# the chip this repo actually profiles ("TPU v5 lite" through the tunnel).
_PEAKS: dict[tuple[str, str], float] = {
    ("TPU v5 lite", "bf16"): 197e12,
    ("TPU v5 lite", "f32"): 49e12,
    ("TPU v5 lite", "int8"): 394e12,
    ("TPU v4", "bf16"): 275e12,
    ("TPU v4", "f32"): 69e12,
    ("TPU v5p", "bf16"): 459e12,
    ("TPU v5p", "f32"): 115e12,
}

_V5E = {
    "hbm_bw_spec": 819e9,
    "hbm_bw_measured": 1.4e12,
    "pallas_dma_bw": 330e9,
    "pallas_compute": 80e12,
    "dispatch_secs": 0.037,
}


def peak_flops(device_kind: str, prec: str = "bf16") -> float:
    for (kind, p), v in _PEAKS.items():
        if device_kind.startswith(kind) and p == prec:
            return v
    if "TPU" in device_kind:
        return 197e12 if prec != "f32" else 49e12
    return 1e12  # CPU-ish fallback for tests


def current_device_kind() -> str:
    try:
        import jax
        return jax.devices()[0].device_kind
    except Exception:
        return ""


def machine_model(device_kind: Optional[str] = None,
                  prec: str = "bf16") -> MachineModel:
    kind = current_device_kind() if device_kind is None else device_kind
    pk = peak_flops(kind, prec)
    if kind.startswith("TPU v5 lite"):
        return MachineModel(kind, prec, pk, measured=True, **_V5E)
    if "TPU" in kind:
        # other TPUs: spec-ish defaults, no measured columns
        return MachineModel(kind, prec, pk, hbm_bw_spec=1.2e12,
                            hbm_bw_measured=0.0, pallas_dma_bw=0.0,
                            pallas_compute=0.0, dispatch_secs=0.0,
                            measured=False)
    return MachineModel(kind or "cpu", prec, pk, hbm_bw_spec=100e9,
                        hbm_bw_measured=0.0, pallas_dma_bw=0.0,
                        pallas_compute=0.0, dispatch_secs=0.0,
                        measured=False)
