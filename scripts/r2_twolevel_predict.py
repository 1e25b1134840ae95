"""Host-side viability predictor for two-level (unique-compacted) ELL
gathers on the big-table graphs.

The gather-floor measurements (tpu_v5e_gather_floor.jsonl) show the
per-index cost cliffs with gather-source size: products-scale tables
run ~8.4 ns/idx (bf16 scan) while <=131k-row tables run ~2.6 ns/idx
(matsum). A chunk whose rows share most of their neighbors could pay
U unique big-table indices once (compact sub-table) and then read its
S slots from the compact table at the small-table rate:

    ratio = (U * r_big + S * r_small(U)) / (S * r_big)

Rows inside a degree-class chunk keep the caller's (rabbit) order, so
consecutive rows are community-adjacent and U/S should sit well below
1. This script measures U/S per chunk for the exact production layout
(quarter buckets, CHUNK_SLOTS splitting) and prints the modeled
speedup per graph. No device work — pure numpy.
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from spmm_denseblock_tpu.io.datasets import load_dataset
from spmm_denseblock_tpu.ops.csr_spmm_ell import CHUNK_SLOTS, _row_widths
from spmm_denseblock_tpu.reorder.registry import reorder_cached

# measured v5e rates, ns/idx (bf16 unless noted); end-to-end validated:
# products quarter+scan 1297.6 ms / 147.4M slots = 8.8; proteins
# remainder at ~2.6 (131k-row table, matsum). The gather-floor rates
# correlate with table BYTES (cache/TLB reach), not row count: 64 MB
# sources run ~2.6, ~128 MB ~4.25, >=256 MB at the big-table rate.
R_BIG = 8.8
F_BYTES = 128 * 2  # bf16 features, F=128


def r_small(u):
    mb = u * F_BYTES / (1 << 20)
    if mb <= 96:
        return 2.6
    if mb <= 160:
        return 4.25
    return R_BIG  # compaction buys nothing


def analyze_subchunks(name, reorder="rabbit",
                      sizes=(1 << 18, 1 << 19, 1 << 20, 1 << 21, 1 << 22)):
    """How does U scale as production chunks split into smaller
    sub-chunks?  Rows stay in rabbit order, so a sub-chunk is a
    contiguous row range of its class.  Models total cost per target
    sub-chunk slot size (compaction applied only where it pays)."""
    csr = load_dataset(name, scale=1.0)
    tag = name.replace("-", "_")
    csr, _ = reorder_cached(csr, reorder, cache_dir="/root/repo/tmp", tag=tag)
    deg = csr.degrees().astype(np.int64)
    K_r = _row_widths(deg, "quarter")
    order = np.argsort(K_r, kind="stable")
    indptr = np.asarray(csr.indptr, np.int64)
    cols = np.asarray(csr.indices, np.int64)

    for target in sizes:
        tot_slots = tot_cur = tot_two = tot_u = 0.0
        n_chunks = n_comp = 0
        for K in np.unique(K_r[order]):
            rows_k = order[K_r[order] == K]
            max_m = max(1, int(target) // int(K))
            for s in range(0, rows_k.size, max_m):
                rk = rows_k[s : s + max_m]
                S = rk.size * int(K)
                parts = [cols[indptr[r] : indptr[r + 1]] for r in rk]
                u = np.unique(np.concatenate(parts)).size if parts else 0
                cur = S * R_BIG
                two = u * R_BIG + S * r_small(u)
                tot_slots += S
                tot_cur += cur
                tot_two += min(cur, two)
                tot_u += u
                n_chunks += 1
                n_comp += two < cur
        print(json.dumps({
            "graph": name, "target_slots": target,
            "chunks": n_chunks, "compacted": n_comp,
            "u_over_s": round(tot_u / tot_slots, 4),
            "cur_model_ms": round(tot_cur / 1e6, 1),
            "two_level_model_ms": round(tot_two / 1e6, 1),
            "model_speedup": round(tot_cur / tot_two, 3),
        }))


def analyze(name, reorder="rabbit"):
    csr = load_dataset(name, scale=1.0)
    tag = name.replace("-", "_")
    csr, _ = reorder_cached(csr, reorder, cache_dir="/root/repo/tmp", tag=tag)
    deg = csr.degrees().astype(np.int64)
    K_r = _row_widths(deg, "quarter")
    order = np.argsort(K_r, kind="stable")
    indptr = np.asarray(csr.indptr, np.int64)
    cols = np.asarray(csr.indices, np.int64)

    # production candidate span: COMPACT_SLOTS capped at the CHUNK_SLOTS
    # HBM guard, and the builder's _COMPACT_MIN_GAIN accept gate
    from spmm_denseblock_tpu.ops.csr_spmm_ell import (
        _COMPACT_MIN_GAIN,
        COMPACT_SLOTS,
    )

    tot_slots = tot_cur = tot_two = tot_u = 0.0
    rows_out = []
    for K in np.unique(K_r[order]):
        rows_k = order[K_r[order] == K]
        max_m = max(1, min(COMPACT_SLOTS, CHUNK_SLOTS) // int(K))
        for s in range(0, rows_k.size, max_m):
            rk = rows_k[s : s + max_m]
            m = rk.size
            S = m * int(K)
            # unique neighbor ids of the chunk's rows (pads reuse row 0)
            parts = [cols[indptr[r] : indptr[r + 1]] for r in rk]
            u = np.unique(np.concatenate(parts)).size if parts else 0
            cur = S * R_BIG
            two = u * R_BIG + S * r_small(u)
            tot_slots += S
            tot_cur += cur
            tot_two += two if two <= _COMPACT_MIN_GAIN * cur else cur
            tot_u += u
            rows_out.append((int(K), m, S, u))
    rec = {
        "graph": name,
        "reorder": reorder,
        "n_rows": int(csr.n_rows),
        "nnz": int(csr.nnz),
        "slots": int(tot_slots),
        "sum_unique": int(tot_u),
        "u_over_s": round(tot_u / tot_slots, 4),
        "cur_model_ms": round(tot_cur / 1e6, 1),
        "two_level_model_ms": round(tot_two / 1e6, 1),
        "model_speedup": round(tot_cur / tot_two, 3),
        "chunks": len(rows_out),
        "chunks_compacted": sum(
            1 for (_, _, S, u) in rows_out
            if u * R_BIG + S * r_small(u) < S * R_BIG
        ),
    }
    print(json.dumps(rec))
    # worst + best few chunks for intuition
    scored = sorted(rows_out, key=lambda t: t[3] / t[2])
    for tag, grp in (("best", scored[:3]), ("worst", scored[-3:])):
        for K, m, S, u in grp:
            print(f"  {tag}: K={K} m={m} S={S} U={u} U/S={u/S:.3f}")
    return rec


if __name__ == "__main__":
    args = sys.argv[1:] or ["ogbn-products"]
    if args[0] == "--sub":
        for g in args[1:] or ["ogbn-products"]:
            analyze_subchunks(g)
    else:
        for g in args:
            analyze(g)
