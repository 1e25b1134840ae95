#!/bin/bash
# Sequential chip-job queue for the round-2 session-3 backlog. Run in
# the background once the axon relay is reachable; each stage appends
# to its own benchmarks/*.jsonl and logs to /tmp/chipq_*.log.
# Stages (chip-sequential to keep the timing harness unperturbed):
#   1. r2s3: proteins/products revalidation after chunk-2D + citation
#   2. meancol A/B (predictor validation; zero new compiles)
#   3. coverage: ogbl-collab + ogbl-ddi via auto(scored)
#   4. full-scale GCN train-step artifacts (proteins, products)
#   5. GAT full-arxiv train-step artifact
#   6. bench.py warm re-run (driver prep) — prints the JSON line
set -u
export JAX_COMPILATION_CACHE_DIR=/tmp/sdb_jax_cache
cd /root/repo

run() {
  local name=$1; shift
  echo "=== [$name] start $(date +%T)"
  timeout 5400 "$@" > "/tmp/chipq_${name}.log" 2>&1
  local rc=$?
  echo "=== [$name] exit ${rc} $(date +%T)"
  grep -hE "^\[|^\{" "/tmp/chipq_${name}.log" | tail -8
}

run r2s3     python scripts/r2_s3_runs.py
run tlprobe  python scripts/r2_twolevel_ab.py
run precab   python scripts/r2_precision_ab.py
run int8ell  python scripts/r2_int8_ell_ab.py
run tlfull   python scripts/r2_twolevel_ab.py --full
run tlint8   python scripts/r2_twolevel_ab.py --full --int8
run meancol  python scripts/r2_meancol_ab.py
run coverage python scripts/r2_coverage_small.py
run train    python scripts/r2_train_fullscale.py
run gat      python scripts/r2_gat_arxiv.py
run calib    python scripts/r2_calibrated_ab.py
run bench    python bench.py
echo "=== chip queue done $(date +%T)"
