#!/bin/bash
# Retry loop for an r5 chip session script: no health subprocess, no
# mid-run kills (killed clients poison the lease ~30 min). The session
# exits 3 on its own when the claim hangs or the relay is slow; we wait
# and retry.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/sdb_jax_cache
SCRIPT=${1:?usage: r5_session_watch.sh <session.py> [log]}
LOG=${2:-/tmp/r5_session.log}
for try in $(seq 1 60); do
  echo "=== [watch] try $try $(date +%T)" >>"$LOG"
  python -u "$SCRIPT" >>"$LOG" 2>&1
  rc=$?
  echo "=== [watch] exit $rc $(date +%T)" >>"$LOG"
  if [ $rc -eq 0 ]; then exit 0; fi
  if [ $rc -ne 3 ]; then exit $rc; fi
  sleep 300
done
exit 1
