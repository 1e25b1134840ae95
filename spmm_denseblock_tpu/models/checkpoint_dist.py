"""Sharded (multi-chip) training-state checkpointing via orbax.

models/checkpoint.py keeps the reference's one-file restart story
(SURVEY.md §5.4) for single-host state. This module is its pod-slice
counterpart: orbax writes each array as a sharded tensorstore, every
process saves only its own shards (no host gather — params at
GB scale never materialize on one host), and restore places shards
directly onto the mesh described by a template state, so a resumed run
continues with the exact sharding layout the train step compiled for.

Usage (see tests/test_checkpoint_dist.py for the mesh round-trip):

    mgr = make_manager("/ckpts/run1", max_to_keep=3)
    save_dist_checkpoint(mgr, step, {"params": p, "opt": o})
    state, step = restore_dist_checkpoint(mgr, like_state=template)

`like_state` supplies structure, dtypes, AND shardings (build it with
the same init + device_put code as training); pass step=None for
latest. Saves are synchronous by default (`wait=True`) — the driver's
preemption model is "resume from last complete step".
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax


def _require_abs(directory: str) -> str:
    # orbax/tensorstore require absolute paths; normalize early so the
    # error is ours and immediate
    return os.path.abspath(directory)


def make_manager(directory: str, max_to_keep: int = 3):
    """A CheckpointManager over `directory` with step retention."""
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        _require_abs(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save_dist_checkpoint(mgr, step: int, state: Any, wait: bool = True):
    """Save `state` (any pytree of jax.Arrays, sharded or not) at
    `step`. wait=False lets orbax finish the write asynchronously —
    overlap with the next training steps, but call
    mgr.wait_until_finished() before exiting."""
    import orbax.checkpoint as ocp

    mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()


def _abstract_like(state: Any):
    """ShapeDtypeStructs carrying each template leaf's sharding, so
    restore places shards without a host round-trip.

    Leaves without a mesh sharding (e.g. optax's scalar `count`, which
    init leaves as an uncommitted single-device array) are restored
    REPLICATED over the mesh of the other leaves: a restored array is
    committed to its sharding's devices, and a committed
    single-device scalar can no longer mix with mesh arrays inside one
    jitted step (ValueError: incompatible devices)."""
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = None
    for leaf in jax.tree.leaves(state):
        s = getattr(leaf, "sharding", None)
        if isinstance(s, NamedSharding):
            mesh = s.mesh
            break

    def one(x):
        sharding = getattr(x, "sharding", None)
        if mesh is not None and not isinstance(sharding, NamedSharding):
            sharding = NamedSharding(mesh, PartitionSpec())
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

    return jax.tree.map(one, state)


def restore_dist_checkpoint(
    mgr, like_state: Any, step: Optional[int] = None
) -> Tuple[Any, int]:
    """Restore into the structure/dtypes/shardings of `like_state`.
    step=None restores the latest complete step. Returns
    (state, step)."""
    import orbax.checkpoint as ocp

    if step is None:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint steps under {mgr.directory}"
            )
    state = mgr.restore(
        step, args=ocp.args.StandardRestore(_abstract_like(like_state))
    )
    return state, int(step)
