"""Round-5 VERDICT #2: close the reorder->halo loop on the pipeline's
OWN output.

BASELINE.md's thesis sentence — "reordering is precisely what makes
graphs halo-eligible" — has until now been validated only on hand-built
banded fixtures (tests/test_parallel.py banded BSRs;
__graft_entry__._dryrun_realistic builds its band synthetically). The
reference's whole pipeline exists to prove the chain
reorder -> densify/band -> faster execution
(/root/reference/reorder_graph.cc:26-49 feeding run_bsrmm.cu:144); this
driver verifies the MIDDLE of that chain on the pipeline's own
reordered graphs:

  per dataset (calibrated stand-ins at the reference's exact sizes) x
  ordering {original, rcmk, rabbit}:
    1. reorder with the pipeline's own strategy (cached permutation);
    2. measure the BLOCK BANDWIDTH distribution (|block_col -
       block_row| quantiles) of the block PATTERN — the quantity halo
       eligibility actually depends on (pattern-only on host: the
       collab-scale value array would be 111 GB, and eligibility never
       reads values);
    3. exact halo-eligibility at n in {2, 4, 8}, halo=1, for BOTH
       uniform stripes and balanced-contiguous boundaries (the same
       predicate bucket_halo applies: every real block's column chunk
       within +-1 of its row's stripe; n <= 2*halo+1 is recorded as
       not-applicable — halo degenerates to allgather there);
    4. if eligible at some n: run dist-halo serving on the CPU mesh
       (correctness + ICI model) — the chain demonstrated end-to-end;
    5. if not: the honest negative with the measured bandwidth, the
       out-of-halo block fraction, and the stripe width / device count
       at which halo WOULD accept (max_bw <= stripe_width suffices).

Appends benchmarks/reorder_halo_r5.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

OUT = "/root/repo/benchmarks/reorder_halo_r5.jsonl"

DATASETS = ["ogbl-ddi", "ogbn-arxiv", "ogbl-collab"]
ORDERINGS = ["original", "rcmk", "rabbit"]
BLOCK = 128
DEVICES = (2, 4, 8)


def record(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as fh:
        fh.write(json.dumps(kw) + "\n")
    print(json.dumps({k: v for k, v in kw.items() if k != "ts"}),
          flush=True)


def block_pattern(csr, b):
    """Unique (block_row, block_col) pairs of the CSR pattern — the
    value-free analog of csr_to_bsr (convert/csr2bsr.py), O(nnz) ints."""
    indptr = np.asarray(csr.indptr, np.int64)
    rows = np.repeat(np.arange(csr.n_rows, dtype=np.int64),
                     np.diff(indptr))
    cols = np.asarray(csr.indices, np.int64)
    nbc = -(-csr.n_cols // b)
    keys = (rows // b) * nbc + (cols // b)
    uk = np.unique(keys)
    return uk // nbc, uk % nbc, -(-csr.n_rows // b), nbc


def halo_eligible(br, bc, nbr, nd, halo=1, boundaries=None):
    """The bucket_halo predicate on the pattern: every block's column
    chunk within +-halo of its row's stripe. Returns (applicable,
    eligible, frac_out)."""
    width = 2 * halo + 1
    if boundaries is None:
        rows_per = -(-nbr // nd)
        s_row = br // rows_per
        s_col = bc // rows_per
    else:
        s_row = np.searchsorted(boundaries, br, side="right") - 1
        s_col = np.searchsorted(boundaries, bc, side="right") - 1
    off = np.abs(s_col - s_row)
    frac_out = float((off > halo).mean())
    return width < nd, bool((off <= halo).all()), frac_out


def main():
    from spmm_denseblock_tpu.io.datasets import load_dataset
    from spmm_denseblock_tpu.reorder.registry import reorder_cached

    done = set()
    if os.path.exists(OUT):
        for line in open(OUT):
            try:
                r = json.loads(line)
            except ValueError:
                continue
            if r.get("kind") == "reorder_halo_bandwidth":
                done.add((r["dataset"], r["ordering"]))

    for ds in DATASETS:
        csr = load_dataset(ds, scale=1.0, profile="calibrated")
        for ordering in ORDERINGS:
            if (ds, ordering) in done:
                print(f"[reorder-halo] skip {ds}/{ordering} (done)",
                      flush=True)
                continue
            t0 = time.time()
            if ordering == "original":
                rcsr = csr
            else:
                rcsr, _ = reorder_cached(
                    csr, ordering, tag=ds.replace("-", "_") + "_cal"
                )
            reorder_s = time.time() - t0
            br, bc, nbr, nbc = block_pattern(rcsr, BLOCK)
            bw = np.abs(bc - br)
            qs = np.quantile(bw, [0.5, 0.9, 0.99, 0.999]).tolist()
            max_bw = int(bw.max())
            n_sufficient = max(1, nbr // max(max_bw, 1))
            rec = {
                "kind": "reorder_halo_bandwidth",
                "dataset": ds, "ordering": ordering, "b": BLOCK,
                "n_block_rows": nbr, "nnzb": int(br.size),
                "reorder_s": round(reorder_s, 1),
                "bw_p50": qs[0], "bw_p90": qs[1], "bw_p99": qs[2],
                "bw_p999": qs[3], "bw_max": max_bw,
                "n_devices_sufficient_halo1": n_sufficient,
            }
            eligible = {}
            counts = np.bincount(br, minlength=nbr).astype(np.int64)
            csum = np.cumsum(counts)
            for nd in DEVICES:
                app_u, ok_u, frac_out = halo_eligible(br, bc, nbr, nd)
                # balanced-contiguous boundaries from the pattern's
                # per-block-row loads (balanced_contiguous_boundaries)
                targets = csum[-1] * np.arange(1, nd) / nd
                cuts = np.searchsorted(csum, targets, side="left") + 1
                bounds = np.concatenate([[0], cuts, [nbr]])
                bounds = np.maximum.accumulate(bounds)
                app_b, ok_b, _ = halo_eligible(
                    br, bc, nbr, nd, boundaries=bounds
                )
                eligible[nd] = {
                    "applicable": bool(app_u),
                    "uniform": bool(ok_u and app_u),
                    "balanced": bool(ok_b and app_b),
                    "frac_blocks_out_of_halo1": frac_out,
                }
            rec["eligibility"] = eligible
            record(**rec)


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print("[reorder-halo] FAILED:", traceback.format_exc(limit=8),
              flush=True)
        sys.exit(1)
