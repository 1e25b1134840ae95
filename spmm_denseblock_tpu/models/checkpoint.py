"""Training-state checkpointing.

The reference's resume story is text files per pipeline stage (SURVEY.md
§5.4) — every binary restarts from disk state. The model family gets the
same property: one-file .npz checkpoints of (params, opt_state, step),
restored against a structural template so the pytree layout (and any
device sharding applied afterwards) stays the caller's concern.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np


def _flatten(tree: Any, prefix: str):
    leaves, treedef = jax.tree.flatten(tree)
    return {f"{prefix}{i}": np.asarray(x) for i, x in enumerate(leaves)}, treedef


def _normalize(path: str) -> str:
    # np.savez appends ".npz" to extensionless paths but np.load does
    # not; normalize on both sides so save("ckpt")/load("ckpt") agree.
    return path if path.endswith(".npz") else path + ".npz"


def save_checkpoint(path: str, params: Any, opt_state: Any = None, step: int = 0):
    arrs, _ = _flatten(params, "p")
    if opt_state is not None:
        o, _ = _flatten(opt_state, "o")
        arrs.update(o)
    arrs["step"] = np.asarray(step)
    np.savez(_normalize(path), **arrs)


def load_checkpoint(
    path: str, like_params: Any, like_opt_state: Any = None
) -> Tuple[Any, Optional[Any], int]:
    """Restore into the structure of the `like_*` templates (build them
    with the same init code, then overwrite with the loaded leaves)."""
    z = np.load(_normalize(path))
    p_leaves, p_def = jax.tree.flatten(like_params)
    params = jax.tree.unflatten(
        p_def, [z[f"p{i}"] for i in range(len(p_leaves))]
    )
    opt_state = None
    if like_opt_state is not None:
        o_leaves, o_def = jax.tree.flatten(like_opt_state)
        opt_state = jax.tree.unflatten(
            o_def, [z[f"o{i}"] for i in range(len(o_leaves))]
        )
    return params, opt_state, int(z["step"])
