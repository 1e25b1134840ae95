"""Chip session 2: validate the post-A/B policy + int8 epilogue fusion.

Runs bench.py in-process (one claim — see r4_chip_session.py). The
prior session's bench ran the PRE-policy code (auto-resident for every
dtype at G=8): bf16 58.4 TF/s (resident win confirmed at plan level)
but f32 21.3 / bf16x3 27.1 / int8 78.3 regressed vs their gather
records (23.6 / 31.2 / 81.1). This session's code routes resident only
for bf16 (now at G=32) and fuses the int8 per-column-scale epilogue
into the kernel; expectations: f32/bf16x3 back to 23.6/31.2, bf16
~62, int8 ~90+.
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
    print(f"[session2 {time.strftime('%T')}] {m}", flush=True)


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

    log("bench.py tiers in-process (policy: resident bf16-only @ pow2 "
        "group; int8 epilogue fused)")
    import bench

    bench.main()
    log("queue done")


if __name__ == "__main__":
    main()
