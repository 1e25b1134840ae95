"""Chip session 4: final round-4 validation sweep.

1. bench.py (post-review-fix sanity; also warms the compile cache for
   the driver's end-of-round bench run)
2. dist-wrapper parity at the headline shape (r4_dist_parity)
3. ogbl-ddi dataset rows (the real graph whose auto route hits the BSR
   tiers this session changed)

One process, one claim (scripts/claim_guard.py).
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from claim_guard import claim_or_exit


def log(m):
    print(f"[session4 {time.strftime('%T')}] {m}", flush=True)


def main():
    claim_or_exit(log)
    log("bench.py (final sanity + cache warm)")
    import bench

    bench.main()

    log("dist parity probe")
    import r4_dist_parity

    r4_dist_parity.main()

    log("ogbl-ddi dataset rows")
    import r4_dataset_matrix as m  # __main__-guarded; run() importable

    for strat in ("original", "rcmk", "rabbit"):
        try:
            m.run("ogbl-ddi", strat)
        except Exception as e:
            log(f"ddi {strat} FAILED: {type(e).__name__}: {e}")
    log("queue done")


if __name__ == "__main__":
    main()
