"""Shared alarm-guarded chip-claim helper for one-process chip sessions.

The axon chip lease binds on a process's FIRST device op; a prior
client killed mid-lease poisons the next claim for ~30 min, and a
claim issued right after another process's release can hang in the
bind loop. Sessions call claim_or_exit() as their first device work:
it runs a tiny guarded matmul and sys.exit(3)s on hang/slowness so an
outer retry loop (scripts/r4_session_watch.sh) can sleep and relaunch
WITHOUT killing a bound client. bench.py carries its own in-file
variant (_warm_claim, retry-in-place) because the driver invokes it
standalone with no retry loop around it.
"""

import signal
import sys
import time


class ClaimHang(Exception):
    pass


def _alarm(sig, frame):
    raise ClaimHang()


def claim_or_exit(log=print, patience_s: int = 180, slow_s: int = 30):
    import jax
    import jax.numpy as jnp

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(patience_s)
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
    if dt > slow_s:
        log(f"claim ok but relay slow ({dt:.1f}s) — exiting 3 for retry")
        sys.exit(3)
