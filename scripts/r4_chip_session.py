"""One-process chip session for the round-4 resident work.

Why one process: the axon chip lease is per-process, a killed client
poisons the next claim for ~30 min, and a fresh claim immediately
after another process's release can hang in the bind loop (observed
11:20 2026-08-20: a health subprocess passed in 1.6 s, the very next
process's first device op hung with no relay connection). So: claim
ONCE, alarm-guard the first op, then run the whole queue in-process.

Exit codes: 0 = full queue done; 3 = claim/first-op hang (watcher
should sleep and retry); anything else = real failure.
"""

import signal
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(m):
    print(f"[session {time.strftime('%T')}] {m}", flush=True)


class ClaimHang(Exception):
    pass


def _alarm(sig, frame):
    raise ClaimHang()


def main():
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(180)
    try:
        t0 = time.time()
        s = float(jnp.sum(jax.jit(lambda a: a @ a)(jnp.ones((2048, 2048)))))
        dt = time.time() - t0
        log(f"claim + first op ok in {dt:.1f}s (sum={s:.3e})")
    except ClaimHang:
        log("claim hang — exiting 3 for retry")
        sys.exit(3)
    finally:
        signal.alarm(0)
    if dt > 30:
        log("claim ok but relay slow — exiting 3 for retry")
        sys.exit(3)

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
