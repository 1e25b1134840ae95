#!/bin/bash
# Round-4 session-2 chip queue: everything that needs the TPU, in
# dependency order, chip-sequential. Run via chip_health_then.sh so it
# only starts in a healthy relay window.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/sdb_jax_cache

echo "=== [queue2] capacity ladder $(date +%T)"
timeout 1200 python -u scripts/r4_resident_probe_lite.py --capacity

echo "=== [queue2] resident A/B $(date +%T)"
timeout 2400 python -u scripts/r4_resident_probe_lite.py

echo "=== [queue2] int8 g32 follow-up $(date +%T)"
timeout 1200 python -u scripts/r4_resident_probe_lite.py \
    --variants int8_g32,bf16_g32

echo "=== [queue2] bench.py (auto-resident headline) $(date +%T)"
timeout 2400 python -u bench.py

echo "=== [queue2] done $(date +%T)"
