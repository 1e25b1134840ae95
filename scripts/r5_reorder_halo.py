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
       block_row| quantiles) of the resulting BSR — the quantity halo
       eligibility actually depends on;
    3. ask bucket_halo (uniform stripes AND balanced-contiguous
       boundaries) whether the reordered graph is halo-eligible at
       n in {2, 4, 8}, halo=1;
    4. if eligible: run dist-halo serving on the 8-device CPU mesh
       (correctness vs scipy + retention) and attach the ICI model row;
    5. if not: record the honest negative with the measured bandwidth,
       the max stripe offset, the out-of-halo block fraction, and the
       stripe width / device count at which halo WOULD accept
       (max_bw <= stripe_width is sufficient for halo=1).

Either way the chain's middle is now measured, not assumed.

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


def main():
    from spmm_denseblock_tpu.convert.csr2bsr import csr_to_bsr
    from spmm_denseblock_tpu.io.datasets import load_dataset
    from spmm_denseblock_tpu.parallel.comms import efficiency_model
    from spmm_denseblock_tpu.parallel.mesh import make_mesh_1d
    from spmm_denseblock_tpu.parallel.shard import (
        balanced_contiguous_boundaries,
        block_index_payload,
        bucket_halo,
        shard_bsr,
    )
    from spmm_denseblock_tpu.parallel.spmm import dist_bsr_spmm_plan
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
            bsr = csr_to_bsr(rcsr, BLOCK)
            nbr = bsr.n_block_rows
            rows = np.asarray(bsr.block_rows[: bsr.nnzb], np.int64)
            cols = np.asarray(bsr.block_cols[: bsr.nnzb], np.int64)
            bw = np.abs(cols - rows)
            qs = np.quantile(bw, [0.5, 0.9, 0.99, 0.999]).tolist()
            max_bw = int(bw.max())
            # halo=1 with uniform stripes accepts when every block col
            # is within +-1 stripe; max_bw <= stripe_width suffices
            n_sufficient = max(1, nbr // max(max_bw, 1))
            rec = {
                "kind": "reorder_halo_bandwidth",
                "dataset": ds, "ordering": ordering, "b": BLOCK,
                "n_block_rows": nbr, "nnzb": int(bsr.nnzb),
                "reorder_s": round(reorder_s, 1),
                "bw_p50": qs[0], "bw_p90": qs[1], "bw_p99": qs[2],
                "bw_p999": qs[3], "bw_max": max_bw,
                "n_devices_sufficient_halo1": n_sufficient,
            }
            eligible = {}
            for nd in DEVICES:
                pay = block_index_payload(bsr.nnzb)
                sh_u = shard_bsr(bsr, nd, payload=pay)
                ok_u = bucket_halo(sh_u, 1) is not None
                try:
                    bounds = balanced_contiguous_boundaries(bsr, nd)
                    sh_b = shard_bsr(bsr, nd, boundaries=bounds,
                                     payload=pay)
                    ok_b = bucket_halo(sh_b, 1) is not None
                except Exception:
                    ok_b = False
                # out-of-halo fraction at uniform stripes
                rows_per = -(-nbr // nd)
                off = np.abs(cols // rows_per - rows // rows_per)
                frac_out = float((off > 1).mean())
                eligible[nd] = {
                    "uniform": ok_u, "balanced": ok_b,
                    "frac_blocks_out_of_halo1": frac_out,
                }
            rec["eligibility"] = eligible
            record(**rec)

            # if eligible anywhere: drive dist-halo serving on the CPU
            # mesh (the chain's missing middle, demonstrated end-to-end)
            for nd in DEVICES:
                e = eligible[nd]
                if not (e["uniform"] or e["balanced"]):
                    continue
                from spmm_denseblock_tpu.bench.timing import time_synced

                mesh = make_mesh_1d(nd)
                x = np.random.default_rng(0).standard_normal(
                    (bsr.shape[1], 64)
                ).astype(np.float32)
                t0 = time.time()
                plan = dist_bsr_spmm_plan(
                    bsr, mesh=mesh, strategy="halo",
                    balance="contiguous" if not e["uniform"] else False,
                )
                plan_s = time.time() - t0
                got = np.asarray(plan(jax.device_put(x)), np.float32)
                want = bsr.to_scipy() @ x
                rel = float(
                    np.abs(got[: want.shape[0]] - want).max()
                    / max(np.abs(want).max(), 1e-30)
                )
                secs = time_synced(plan, jax.device_put(x), iters=4)
                model = efficiency_model(
                    "halo", nd, int(bsr.nnzb), BLOCK, bsr.shape[1], 64,
                    itemsize=4, dtype_flops="f32",
                )
                record(
                    kind="reorder_halo_serving", dataset=ds,
                    ordering=ordering, devices=nd, b=BLOCK,
                    backend="cpu-mesh", ms=secs * 1e3,
                    plan_s=round(plan_s, 2), max_rel_err=rel,
                    gate_ok=rel < 1e-4,
                    ici_model_efficiency=model["efficiency"],
                )
                del plan
                break  # one demonstration per (dataset, ordering)


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print("[reorder-halo] FAILED:", traceback.format_exc(limit=8),
              flush=True)
        sys.exit(1)
