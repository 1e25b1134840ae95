#!/bin/bash
# Health-gated chip runner: waits for the axon relay to drain real
# transfers at usable speed, then runs the given command once.
#
# Background: the relay's upstream channel intermittently collapses to
# ~50 kB/s (observed during the round-4 resident probe: a 677 MB block
# transfer stuck with 4 MB in Send-Q). A 16 MB round-trip in <15 s is
# the "healthy" gate — at the degraded rate it cannot pass. (Timing
# quality needs dispatch << kernel time, hence the tight bound.)
#
# Usage: scripts/chip_health_then.sh <logfile> <cmd...>
set -u
LOG="$1"; shift
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/sdb_jax_cache
tries=0
while [ $tries -lt 80 ]; do
  tries=$((tries + 1))
  if timeout 90 python - >>"$LOG" 2>&1 <<'EOF'
import time, numpy as np, jax, jax.numpy as jnp
t0 = time.time()
x = jax.device_put(np.ones((2048, 2048), np.float32))  # 16 MB up
s = float(jnp.sum(jax.jit(lambda a: a @ a)(x)))        # compile+exec
back = np.asarray(x)                                    # 16 MB down
dt = time.time() - t0
print(f"[health] ok in {dt:.1f}s sum={s:.3e}", flush=True)
raise SystemExit(0 if dt < 15 else 1)
EOF
  then
    echo "[health] PASS (try $tries) $(date +%T)" >>"$LOG"
    "$@" >>"$LOG" 2>&1
    rc=$?
    echo "[health] command exit=$rc $(date +%T)" >>"$LOG"
    exit $rc
  fi
  echo "[health] degraded (try $tries) $(date +%T)" >>"$LOG"
  sleep 240
done
echo "[health] gave up after $tries tries" >>"$LOG"
exit 1
