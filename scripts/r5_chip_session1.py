"""Round-5 chip session 1: dist-parity plan-budget closure + SoL
re-derivation at the shipped geometry + headline bench sanity.

One process (chip lease discipline, see claim_guard): claim, then run
the two r5 measurement drivers in-process, then bench.py tiers.
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
    print(f"[r5s1 {time.strftime('%T')}] {m}", flush=True)


def main():
    claim_or_exit(log)
    log("dist parity r5 (plan budget + kernel parity)")
    import r5_dist_parity

    r5_dist_parity.main()
    log("SoL reconcile r5 (shipped tiers)")
    import r5_sol_reconcile

    r5_sol_reconcile.main()
    log("bench.py tiers")
    import bench

    bench.main()
    log("queue done")


if __name__ == "__main__":
    main()
