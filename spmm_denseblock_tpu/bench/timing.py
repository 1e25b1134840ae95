"""Device timing that survives the axon relay (see verify skill notes).

Three rules, validated empirically on the tunneled TPU:
1. CHAIN — iteration i+1 must consume iteration i's output; repeated
   identical calls get cached/overlapped somewhere in the relay (naive
   total/iters was off by 100x).
2. READBACK BARRIER — block_until_ready can return before device work
   completes; fetching a device-computed scalar is the only real sync.
3. MARGINAL COST — time chains of depth n and kn, divide the difference,
   cancelling constant dispatch/sync overhead.

The reference times with CUDA events around one call
(/root/reference/run_csrmm.cu:125-151); events don't exist in JAX and
single timed calls are meaningless through a relay, hence this design.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

# Documented relay-day cross-run variance band (round-3/4 chip
# sessions): ~10%. time_repeats flags any record whose own min-max
# spread exceeds this fraction of the median.
_SPREAD_WARN_FRAC = 0.10

_scale = jax.jit(lambda x: x * jnp.float32(1e-2))
_sum = jax.jit(lambda x: jnp.sum(x))
# x + eps * sum(y): a true VALUE dependency on y. eps must NOT underflow
# (an earlier 1e-30 underflowed to 0, making every chain input
# bit-identical to x0 — the relay then deduped the identical calls and
# marginal-cost timing read 0.00/wildly-low for some program shapes,
# e.g. the banded-gather probes). 1e-12 keeps the numerical drift ~1e-8
# per element while every iteration's input differs in value.
_mix = jax.jit(lambda x, y: x + jnp.float32(1e-12) * jnp.sum(y))


def time_chained_square(fn: Callable, x0, iters: int = 10, k: int = 6) -> float:
    """Per-call seconds for fn: (N, F) -> (N, F) (output feeds input)."""
    # warm every op INCLUDING the chained call: a sharded fn (dist
    # plans) commits its output to the mesh sharding, so fn(chained)
    # jit-caches under a different input sharding than fn(x0) — warming
    # only fn(x0) left one retrace inside the first timed chain, which
    # made t(n) >= t(kn) and the marginal cost clamp to the 1e-9 floor
    # (observed on the round-3 dist-Pallas probe).
    float(_sum(_scale(fn(_scale(fn(x0))))))

    def chain(n):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = _scale(fn(x))
        float(_sum(x))
        return time.perf_counter() - t0

    t1, t2 = chain(iters), chain(k * iters)
    return max((t2 - t1) / ((k - 1) * iters), 1e-9)


def time_chained(fn: Callable, x0, iters: int = 10, k: int = 6) -> float:
    """Per-call seconds for fn with any output shape: the next input is
    x0 + eps*sum(prev_output), a true data dependency."""
    # warm the chained call too (see time_chained_square: sharded fns
    # retrace under the chained input's committed sharding)
    float(_sum(_mix(x0, fn(_mix(x0, fn(x0))))))

    def chain(n):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = _mix(x0, fn(x))
        float(_sum(x))
        return time.perf_counter() - t0

    t1, t2 = chain(iters), chain(k * iters)
    return max((t2 - t1) / ((k - 1) * iters), 1e-9)


def time_repeats(
    fn: Callable, x0, repeats: int = 3, iters: int = 10, k: int = 6,
    square: bool = False,
) -> dict:
    """Repeated marginal-cost measurement with spread — the round-3
    variance control (relay-day cross-run variance is ~10%; single-run
    records let close calls hide inside the noise band) promoted to the
    first-class timing API. Runs the full chained measurement `repeats`
    times back-to-back (everything stays compiled after the first) and
    returns {"secs": median, "secs_min", "secs_max", "repeats"} so every
    record carries its own interval. Conclusions at margins inside
    [secs_min, secs_max] are not conclusions."""
    timer = time_chained_square if square else time_chained
    vals = sorted(timer(fn, x0, iters=iters, k=k) for _ in range(repeats))
    mid = vals[len(vals) // 2] if repeats % 2 else (
        0.5 * (vals[len(vals) // 2 - 1] + vals[len(vals) // 2])
    )
    out = {
        "secs": mid,
        "secs_min": vals[0],
        "secs_max": vals[-1],
        "repeats": repeats,
    }
    # Self-flagging records (round-4 verdict #8): the documented
    # relay-day cross-run variance band is ~10%; when a measurement's
    # own spread exceeds it, stamp the record so an automated reader
    # does not parse relay degradation as a real effect.
    spread_frac = (vals[-1] - vals[0]) / max(mid, 1e-12)
    out["spread_frac"] = round(spread_frac, 4)
    if spread_frac > _SPREAD_WARN_FRAC:
        out["spread_warn"] = True
    return out


def time_synced(fn: Callable, x0, iters: int = 8) -> float:
    """Fully-synchronous chained timing: readback barrier after EVERY
    call. Slower and includes per-call sync overhead, but never builds a
    deep async queue — required for multi-device CPU-mesh runs, where
    interleaved collective rendezvous from queued executions can
    deadlock the XLA CPU runtime (observed with an 8-device ppermute
    ring under chained dispatch)."""
    x = _mix(x0, fn(x0))
    float(_sum(x))  # warm every op
    t0 = time.perf_counter()
    for _ in range(iters):
        x = _mix(x0, fn(x))
        float(_sum(x))
    return (time.perf_counter() - t0) / iters
