"""Host-side predictor for SEGMENTED two-level ELL (design study).

The per-class-chunk two-level gather (csr_spmm_ell compact="auto") pays
U * r_big once PER (class, span). A row-segment design would instead
cut the graph into contiguous row segments (rabbit order keeps
communities contiguous), build ONE compact table per segment (U =
unique neighbors of all the segment's rows, across every degree
class), and run the segment's per-class ELL sub-chunks against it.
With cross-segment-uniform class capacities (the dist-ELL trick) the
whole thing is one lax.scan body — op count independent of segment
count.

Costs modeled here, against both the flat incumbent and the per-class
compact variant:
  + ONE unique-gather per segment (U_seg, amortized across classes)
  - capacity padding: class capacities padded to the max over segments
  - scan-body uniformity forces EVERY segment through the compact path
This script measures U_seg and the capacity-padding blowup on the real
full-scale graphs. No device work.

RESULT (full synthetic ogbn-products, rabbit, 2026-08-18): NEGATIVE.
Capacity padding explodes — 4.2x total slots at 16 segments, 20x at
128 (hub degree classes appear in few segments but the uniform
capacity forces every segment to carry them), and max_u stays ~2.3M
(hub neighborhoods span the whole table) so the sub-table never drops
to the fast rate anyway. Modeled 0.05-0.23x vs flat. The per-(class,
span) compaction in ops/csr_spmm_ell (compact="auto") keeps the
padding exact and the op count bounded — it is the right design; do
not revisit segmented-scan without per-segment RAGGED capacities
(which XLA's static shapes cannot express without per-segment
programs, i.e. the existing per-chunk design).
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from spmm_denseblock_tpu.io.datasets import load_dataset
from spmm_denseblock_tpu.ops.csr_spmm_ell import (
    _gather_ns_per_slot,
    _row_widths,
)
from spmm_denseblock_tpu.reorder.registry import reorder_cached

F, ITEM = 128, 2  # bf16 serving regime


def analyze(name, n_segs_list=(16, 32, 64, 128), reorder="rabbit"):
    csr = load_dataset(name, scale=1.0)
    tag = name.replace("-", "_")
    csr, _ = reorder_cached(csr, reorder, cache_dir="/root/repo/tmp", tag=tag)
    deg = csr.degrees().astype(np.int64)
    K_r = _row_widths(deg, "quarter")
    indptr = np.asarray(csr.indptr, np.int64)
    cols = np.asarray(csr.indices, np.int64)
    n = csr.n_rows
    flat_slots = int(K_r.sum())
    r_big = _gather_ns_per_slot(csr.n_cols * F * ITEM, ITEM)
    flat_ms = flat_slots * r_big / 1e6

    for n_segs in n_segs_list:
        bounds = np.linspace(0, n, n_segs + 1).astype(np.int64)
        Ks = np.unique(K_r)
        # per-segment class counts -> uniform capacities
        seg_counts = np.zeros((n_segs, Ks.size), np.int64)
        u_tot = 0
        u_max = 0
        for si in range(n_segs):
            lo, hi = bounds[si], bounds[si + 1]
            kseg = K_r[lo:hi]
            seg_counts[si] = [(kseg == K).sum() for K in Ks]
            u = np.unique(cols[indptr[lo]: indptr[hi]]).size
            u_tot += u
            u_max = max(u_max, u)
        caps = seg_counts.max(axis=0)
        seg_slots = int((caps * Ks).sum())  # per segment, uniform
        total_slots = n_segs * seg_slots
        r_sub = _gather_ns_per_slot(u_max * F * ITEM, ITEM)
        model_ms = (u_tot * r_big + total_slots * r_sub) / 1e6
        print(json.dumps({
            "graph": name, "n_segs": n_segs,
            "flat_slots": flat_slots, "seg_slots_total": total_slots,
            "capacity_pad_ratio": round(total_slots / flat_slots, 3),
            "sum_u": int(u_tot), "max_u": int(u_max),
            "r_sub": r_sub,
            "flat_model_ms": round(flat_ms, 1),
            "seg_model_ms": round(model_ms, 1),
            "model_speedup": round(flat_ms / model_ms, 3),
        }))


if __name__ == "__main__":
    for g in sys.argv[1:] or ["ogbn-products"]:
        analyze(g)
