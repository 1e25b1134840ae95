"""Distributed end-to-end GNN training step over a 2D ("row", "col") mesh.

Parallelism map (the tp/dp/sp analogs for a graph workload):
  "row" — partitions graph nodes: A's block-row stripes, X/H/C rows,
          labels, masks. This is simultaneously the data-parallel and
          sequence/space-parallel axis of a GNN (nodes are the batch).
          The SpMM halo exchange (all_gather or ppermute ring) runs here.
  "col" — tensor parallelism: feature/hidden dims of X/H and the output
          dim of every weight matrix. Dense H @ W contractions run as
          partial matmuls with GSPMD-inserted collectives on this axis.

The sparse aggregation uses the hand-scheduled shard_map kernel
(parallel/spmm.py) inside the jitted step; the dense layers are left to
GSPMD via sharding annotations — collectives never cross axes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spmm_denseblock_tpu.convert.csr2bsr import csr_to_bsr
from spmm_denseblock_tpu.formats.bsr import BSR
from spmm_denseblock_tpu.formats.csr import CSR
from spmm_denseblock_tpu.models.gnn import MODELS
from spmm_denseblock_tpu.models.train import accuracy, masked_cross_entropy
from spmm_denseblock_tpu.parallel.spmm import dist_bsr_spmm_plan


def _shard_params(params, mesh: Mesh, col_axis: Optional[str]):
    """Weights: output dim over the tp axis; biases likewise. Dims that do
    not divide the axis size stay replicated (e.g. a tiny class count)."""
    n_col = int(mesh.shape[col_axis]) if col_axis else 1

    def put(leaf):
        ax = col_axis if leaf.ndim and leaf.shape[-1] % n_col == 0 else None
        if leaf.ndim == 2:
            spec = P(None, ax)
        elif leaf.ndim == 1:
            spec = P(ax)
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(put, params)


def make_dist_train_step(
    adjacency,
    mesh: Mesh,
    dims: Sequence[int],
    model: str = "gcn",
    block_size: int = 128,
    strategy: str = "allgather",
    optimizer: Optional[optax.GradientTransformation] = None,
    seed: int = 0,
    dtype=None,
):
    """Build (params, opt_state, step) with everything sharded over `mesh`.

    adjacency: a (normalized) CSR or BSR. step(params, opt_state, x, y,
    mask) -> (params, opt_state, metrics) is one fully-jitted training
    step; inputs are constrained to the mesh layout on entry.
    """
    from spmm_denseblock_tpu.formats.hybrid import Hybrid
    from spmm_denseblock_tpu.parallel.spmm import dist_hybrid_spmm_plan

    row_axis = mesh.axis_names[0]
    col_axis = None
    if len(mesh.axis_names) > 1 and int(mesh.shape[mesh.axis_names[1]]) > 1:
        col_axis = mesh.axis_names[1]

    if isinstance(adjacency, Hybrid):
        # the north-star path for gather-bound graphs (proteins/products):
        # BSR-ification is infeasible there (~200x zero fill), so the
        # aggregation runs dense stripes + the dist ELL remainder. The
        # SpMM output is replicated over the tp axis (GSPMD re-shards).
        spmm = dist_hybrid_spmm_plan(
            adjacency, mesh=mesh, axis=row_axis, strategy=strategy,
            dtype=dtype,
        )
    else:
        if isinstance(adjacency, CSR):
            bsr = csr_to_bsr(adjacency, block_size)
        else:
            bsr = adjacency
        assert isinstance(bsr, BSR)
        spmm = dist_bsr_spmm_plan(
            bsr,
            mesh=mesh,
            axis=row_axis,
            strategy=strategy,
            dtype=dtype,
            feature_axis=col_axis,
        )

    init_fn, apply_fn = MODELS[model]
    params = init_fn(jax.random.PRNGKey(seed), dims)
    params = _shard_params(params, mesh, col_axis)
    optimizer = optimizer or optax.adam(1e-2)
    opt_state = optimizer.init(params)

    x_sharding = NamedSharding(mesh, P(row_axis, col_axis))
    node_sharding = NamedSharding(mesh, P(row_axis))

    def loss_fn(params, spmm_arg, x, y, mask):
        logits = apply_fn(params, spmm_arg, x)
        return masked_cross_entropy(logits, y, mask), logits

    # GB-scale note (ops/plan.py): dist plans are Plan pytrees, so the
    # jitted step takes the plan as an ARGUMENT — its sharded device
    # arrays stay runtime parameters instead of HLO constants (which
    # blow up the program upload at products scale).
    @jax.jit
    def _step(spmm_arg, params, opt_state, x, y, mask):
        x = jax.lax.with_sharding_constraint(x, x_sharding)
        y = jax.lax.with_sharding_constraint(y, node_sharding)
        mask = jax.lax.with_sharding_constraint(mask, node_sharding)
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, spmm_arg, x, y, mask
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "acc": accuracy(logits, y, mask)}

    def step(params, opt_state, x, y, mask):
        return _step(spmm, params, opt_state, x, y, mask)

    return params, opt_state, step


def random_problem(n_nodes: int, dims: Sequence[int], p: float = 0.05, seed: int = 0):
    """Tiny synthetic node-classification problem (for dry runs/tests)."""
    from spmm_denseblock_tpu.formats.csr import random_csr
    from spmm_denseblock_tpu.models.graph import sym_norm_adjacency

    rng = np.random.default_rng(seed)
    adj = sym_norm_adjacency(random_csr(p, n_nodes, seed=seed, values="ones"))
    x = rng.standard_normal((n_nodes, dims[0])).astype(np.float32)
    y = rng.integers(0, dims[-1], size=n_nodes).astype(np.int32)
    mask = (rng.random(n_nodes) < 0.7).astype(np.float32)
    return adj, x, y, mask
