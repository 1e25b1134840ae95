"""One-process chip session for the round-4 resident work.

Why one process: the axon chip lease is per-process (see
scripts/claim_guard.py for the full story). Exit codes: 0 = full
queue done; 3 = claim/first-op hang (watcher sleeps and retries).
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
    print(f"[session {time.strftime('%T')}] {m}", flush=True)


def main():
    claim_or_exit(log)
    from r4_resident_probe_lite import capacity_ladder, run_ab

    log("capacity ladder")
    capacity_ladder()
    log("resident A/B (primary variants)")
    run_ab("int8_g8,int8_g16,bf16_g8,bf16_g16,bf16x3_g8,f32_g8", repeats=3)
    log("resident A/B (G=32 follow-up)")
    run_ab("int8_g32,bf16_g32", repeats=3)
    log("bench.py tiers in-process (auto-resident headline)")
    import bench

    bench.main()
    log("queue done")


if __name__ == "__main__":
    main()
