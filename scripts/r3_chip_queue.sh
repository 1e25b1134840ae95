#!/bin/bash
# Round-3 follow-up chip queue: waits for the round-2 queue to finish
# (chip-sequential discipline — concurrent chip work perturbs the
# chained timing harness), then runs the stages that depend on round-3
# code fixes. Each stage logs to /tmp/chipq3_*.log.
set -u
export JAX_COMPILATION_CACHE_DIR=/tmp/sdb_jax_cache
cd /root/repo

# wait for the round-2 queue (marker line in its main log)
while ! grep -q "chip queue done" /tmp/chipq_main.log 2>/dev/null; do
  sleep 30
done

run() {
  local name=$1; shift
  echo "=== [$name] start $(date +%T)"
  timeout 5400 "$@" > "/tmp/chipq3_${name}.log" 2>&1
  local rc=$?
  echo "=== [$name] exit ${rc} $(date +%T)"
  grep -hE "^\[|^\{" "/tmp/chipq3_${name}.log" | tail -8
}

run precab2 python scripts/r2_precision_ab.py
run bench2  python bench.py
run matrix  python scripts/r3_dataset_matrix.py
run bench3  python bench.py
echo "=== r3 chip queue done $(date +%T)"
