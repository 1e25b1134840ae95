"""Communication-volume model for the distributed SpMM strategies.

Why this exists: single-host CPU-mesh benchmarks CANNOT demonstrate ICI
scaling — all N virtual devices share the same cores (total compute is
fixed) and XLA:CPU emulates collectives through shared memory, so their
cost model is unrelated to a pod slice's. What a CPU mesh CAN validate
is correctness, partitioning overhead, and total-throughput retention.
The multi-chip efficiency claim therefore needs the ICI arithmetic made
explicit — this module is that arithmetic (the scaling-book recipe:
compare per-device compute time against per-device collective bytes over
ICI bandwidth).

Hardware constants default to TPU v5e (the chip every measured number in
benchmarks/ comes from): 197 TFLOP/s bf16 / ~49 f32, 819 GB/s HBM, and
~45 GB/s usable per-direction ICI bandwidth per 1D ring neighbor link
(v5e has 4 ICI links per chip on a 2D torus; a 1D stripe mesh uses one
neighbor pair). All overridable for other parts.

Per-call, per-device bytes for C = A @ B, A row-striped over n devices,
B row-sharded (K x F, dtype s bytes):

  allgather — every device RECEIVES the other shards of B once:
              (n-1)/n * K * F * s        (one tiled all-gather)
  ring      — same total volume, moved in n-1 neighbor ppermute steps of
              K/n * F * s each; each step overlaps the previous chunk's
              block GEMMs (the double-buffered schedule).
  halo      — only 2*halo neighbor chunks ever move:
              2*halo/n * K * F * s       (O(1) in n; needs bandedness)

Per-device compute: 2 * (nnzb/n) * b^2 * F flops on the MXU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import numpy as np


@dataclass(frozen=True)
class ChipModel:
    """TPU v5e defaults; every field overridable."""

    name: str = "tpu_v5e"
    peak_flops_f32: float = 49e12   # 6-pass bf16 MXU (HIGHEST)
    peak_flops_bf16: float = 197e12
    hbm_gbps: float = 819e9
    ici_gbps: float = 45e9          # per-direction neighbor link, usable
    mfu: float = 0.6                # measured flat-kernel fraction of peak


V5E = ChipModel()


def comms_bytes_per_device(
    strategy: str, n: int, K: int, F: int, itemsize: int = 4, halo: int = 1
) -> float:
    """Bytes RECEIVED per device per SpMM call (send volume is equal)."""
    total_b = K * F * itemsize
    if n <= 1:
        return 0.0
    if strategy == "allgather":
        return (n - 1) / n * total_b
    if strategy == "ring":
        return (n - 1) / n * total_b  # n-1 steps of K/n rows each
    if strategy == "halo":
        return min(2 * halo, n - 1) / n * total_b
    raise ValueError(strategy)


def efficiency_model(
    strategy: str,
    n: int,
    nnzb: int,
    b: int,
    K: int,
    F: int,
    itemsize: int = 4,
    halo: int = 1,
    chip: ChipModel = V5E,
    dtype_flops: str = "f32",
    overlap: bool = True,
) -> Dict:
    """Predicted scaling efficiency on real hardware.

    efficiency = T_comp / max(T_comp, T_comm) when the schedule overlaps
    communication with compute (ring/halo; XLA also overlaps the single
    all-gather with the first GEMMs when it can), else
    T_comp / (T_comp + T_comm).

    Returns the full term breakdown so artifacts can record the model
    next to the measurement."""
    peak = (
        chip.peak_flops_bf16 if dtype_flops == "bf16" else chip.peak_flops_f32
    )
    t_comp = (2.0 * nnzb / max(n, 1) * b * b * F) / (peak * chip.mfu)
    bytes_dev = comms_bytes_per_device(strategy, n, K, F, itemsize, halo)
    t_comm = bytes_dev / chip.ici_gbps
    if overlap:
        t_total = max(t_comp, t_comm)
    else:
        t_total = t_comp + t_comm
    eff = t_comp / t_total if t_total else 1.0
    return {
        "strategy": strategy,
        "n": n,
        "t_comp_us": t_comp * 1e6,
        "t_comm_us": t_comm * 1e6,
        "bytes_per_device": bytes_dev,
        "efficiency": eff,
        "chip": chip.name,
    }


def min_nnzb_for_efficiency(
    strategy: str,
    n: int,
    b: int,
    K: int,
    F: int,
    target: float = 0.8,
    itemsize: int = 4,
    halo: int = 1,
    chip: ChipModel = V5E,
    dtype_flops: str = "f32",
) -> int:
    """Smallest total nnzb for which the model predicts >= target
    efficiency (with overlap, efficiency hits 1.0 exactly when
    T_comp >= T_comm; the target shapes the non-overlapped reserve)."""
    peak = (
        chip.peak_flops_bf16 if dtype_flops == "bf16" else chip.peak_flops_f32
    )
    bytes_dev = comms_bytes_per_device(strategy, n, K, F, itemsize, halo)
    t_comm = bytes_dev / chip.ici_gbps
    # T_comp >= target * t_comm  (overlap model)
    need_flops_dev = t_comm * target * peak * chip.mfu
    nnzb_dev = need_flops_dev / (2.0 * b * b * F)
    return int(np.ceil(nnzb_dev * n)) if nnzb_dev else 0
