"""CPU-mesh distributed TRAIN-STEP scaling artifact (runs on the
8-virtual-device host mesh, no chip needed). Writes
benchmarks/scaling_train_cpu_mesh.jsonl — the train-level counterpart
of scaling_cpu_mesh_r2.jsonl, same retention discipline."""

import json
import os
import sys

# XLA_FLAGS must be set before jax initializes the CPU client; the env
# JAX_PLATFORMS alone canNOT override the axon site hook — the in-process
# config.update below is what actually forces CPU (verify skill notes).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from spmm_denseblock_tpu.bench.harness import bench_train_scaling

OUT = "/root/repo/benchmarks/scaling_train_cpu_mesh.jsonl"

# ring capped at 4 devices: the 8-device ring TRAIN step (ppermute ring
# + GSPMD all-reduces in one program) trips the XLA CPU runtime's
# cross-module rendezvous abort — replicas reach different collectives
# and the 40 s termination timeout fires (observed 2026-08-18; the
# SpMM-only 8-dev ring survives only under fully-synced timing,
# bench/timing.time_synced). An emulation-runtime limit, not a design
# property; the dryrun's ring path runs the row axis at <= 4 devices.
CASES = [("allgather", [1, 2, 4, 8]), ("ring", [1, 2, 4])]

with open(OUT, "a") as f:
    for strategy, devs in CASES:
        rec = bench_train_scaling(devs, strategy=strategy)
        f.write(json.dumps(rec) + "\n")
        f.flush()
        pts = ", ".join(
            f"{p['devices']}d {p['ms_per_step']:.0f}ms r={p['retention']:.2f}"
            for p in rec["points"]
        )
        print(f"[train-scaling] {strategy}: {pts}", flush=True)
