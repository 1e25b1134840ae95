#!/bin/bash
# Retry loop for r4_chip_session.py: no health subprocess (a separate
# claim right before the real one can poison it — see the session
# docstring), no mid-run kills (killed clients poison the lease).
# The session exits 3 on its own when the claim hangs or the relay is
# slow; we just wait and retry.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/sdb_jax_cache
LOG=${1:-/tmp/r4_session.log}
for try in $(seq 1 60); do
  echo "=== [watch] try $try $(date +%T)" >>"$LOG"
  python -u scripts/r4_chip_session.py >>"$LOG" 2>&1
  rc=$?
  echo "=== [watch] exit $rc $(date +%T)" >>"$LOG"
  if [ $rc -eq 0 ]; then exit 0; fi
  if [ $rc -ne 3 ]; then exit $rc; fi
  sleep 300
done
exit 1
