"""Sharded checkpoint round-trip on the 8-device CPU mesh.

The save path must write sharded arrays without gathering them to one
host buffer; the restore path must land shards back on the mesh with
the template's shardings (models/checkpoint_dist.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from spmm_denseblock_tpu.models.checkpoint_dist import (
    make_manager,
    restore_dist_checkpoint,
    save_dist_checkpoint,
)
from spmm_denseblock_tpu.parallel.mesh import make_mesh


@pytest.fixture
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return make_mesh((8, 1))


def _state(mesh):
    rng = np.random.default_rng(7)
    w = jax.device_put(
        rng.standard_normal((64, 16)).astype(np.float32),
        NamedSharding(mesh, P("row", None)),
    )
    b = jax.device_put(
        rng.standard_normal((16,)).astype(np.float32),
        NamedSharding(mesh, P()),
    )
    return {"params": {"w": w, "b": b}, "opt": {"mu": jnp.zeros((64, 16))}}


def test_sharded_roundtrip(tmp_path, mesh):
    state = _state(mesh)
    mgr = make_manager(str(tmp_path / "ckpt"), max_to_keep=2)
    save_dist_checkpoint(mgr, 5, state)

    template = jax.tree.map(jnp.zeros_like, state)
    restored, step = restore_dist_checkpoint(mgr, template)
    assert step == 5
    for got, want in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # shardings land as the template's (mesh placement preserved)
    assert restored["params"]["w"].sharding == state["params"]["w"].sharding


def test_retention_and_latest(tmp_path, mesh):
    state = _state(mesh)
    mgr = make_manager(str(tmp_path / "ckpt"), max_to_keep=2)
    for s in (1, 2, 3):
        save_dist_checkpoint(mgr, s, state)
    # retention: only the last two steps survive
    assert mgr.latest_step() == 3
    assert set(mgr.all_steps()) == {2, 3}
    _, step = restore_dist_checkpoint(mgr, state, step=None)
    assert step == 3


def test_restore_missing_raises(tmp_path, mesh):
    mgr = make_manager(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        restore_dist_checkpoint(mgr, _state(mesh))
