"""Chip session 3: scratch-resident bf16 probe.

The resident bf16 kernel's per-step time (~2.74 us at g32) matches MXU
time + blocks-DMA time ADDED rather than overlapped — hypothesis: the
single-buffered dense operand in the BlockSpec pipeline serializes it.
The scratch-resident variant DMAs the dense slice once per f pass into
persistent VMEM scratch and keeps only double-buffered operands in the
pipeline. If overlap is restored, per-step drops toward max(1.36,
1.28) us and bf16 lands ~3.2-4 ms (87-108 TF/s).

One process, alarm-guarded claim (see r4_chip_session.py).
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
    print(f"[session3 {time.strftime('%T')}] {m}", flush=True)


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

    from r4_resident_probe_lite import run_ab

    log("scratch-resident bf16 A/B")
    run_ab("bf16_g32_s,bf16_g16_s,bf16_g8_s", repeats=3)
    log("queue done")


if __name__ == "__main__":
    main()
