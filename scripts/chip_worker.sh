#!/bin/bash
# Chip job worker: runs job files from scripts/chipjobs/ one at a time
# (chip-sequential discipline — concurrent chip work perturbs chained
# timing). Each *.job file is a shell command; on completion it moves
# to .done (or .fail). New jobs can be dropped in while the worker
# runs. Waits for the round-2 queue to finish first. Exits after 30
# idle minutes with no pending jobs.
set -u
export JAX_COMPILATION_CACHE_DIR=/tmp/sdb_jax_cache
cd /root/repo
while ! grep -q "chip queue done" /tmp/chipq_main.log 2>/dev/null; do
  sleep 30
done
idle=0
while [ $idle -lt 60 ]; do
  job=$(ls scripts/chipjobs/*.job 2>/dev/null | sort | head -1)
  if [ -z "$job" ]; then
    idle=$((idle + 1)); sleep 30; continue
  fi
  idle=0
  name=$(basename "$job" .job)
  echo "=== [$name] start $(date +%T)"
  timeout 7200 bash "$job" > "/tmp/chipq3_${name}.log" 2>&1
  rc=$?
  echo "=== [$name] exit $rc $(date +%T)"
  grep -hE "^\[|^\{" "/tmp/chipq3_${name}.log" | tail -10
  if [ $rc -eq 0 ]; then mv "$job" "$job.done"; else mv "$job" "$job.fail"; fi
done
echo "=== chip worker idle-exit $(date +%T)"
