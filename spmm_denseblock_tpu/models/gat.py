"""Graph attention network (GAT) — the model that exercises BOTH sparse
ops: SDDMM-style per-edge scoring and value-carrying SpMM aggregation.

GAT needs per-edge attention computed fresh every forward pass, so its
aggregation cannot close over static matrix values like GCN's; the plan
factory prepares the edge index vectors once and the apply function
computes scores -> segment softmax -> weighted segment-sum, all inside
one jitted program. Multi-head via a heads dimension on the VPU ops and
one fused matmul for the projections.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spmm_denseblock_tpu.formats.csr import CSR
from spmm_denseblock_tpu.models.gnn import _glorot


def init_gat(key, dims: Sequence[int], heads: int = 2) -> List[dict]:
    """dims = [in, hidden..., out] per-head widths; layer i projects
    dims[i] (* heads for i>0, concat) -> heads * dims[i+1]."""
    layers = []
    keys = jax.random.split(key, 3 * (len(dims) - 1))
    for i in range(len(dims) - 1):
        d_in = dims[i] * (heads if i > 0 else 1)
        d_out = dims[i + 1]
        layers.append(
            {
                "w": _glorot(keys[3 * i], (d_in, heads * d_out)),
                "a_src": 0.1 * jax.random.normal(keys[3 * i + 1], (heads, d_out)),
                "a_dst": 0.1 * jax.random.normal(keys[3 * i + 2], (heads, d_out)),
            }
        )
    return layers


def make_gat_apply(csr: CSR, heads: int = 2):
    """Prepare edge indices once -> apply(params, x) -> (n, heads*d_last)
    (last layer averages heads instead of concatenating, GAT convention)."""
    row_ids = jnp.asarray(csr.row_ids())
    col_ids = jnp.asarray(np.asarray(csr.indices, dtype=np.int32))
    n = csr.n_rows

    def layer(p, h, concat: bool):
        d_out = p["a_src"].shape[1]
        hw = (h @ p["w"]).reshape(h.shape[0], heads, d_out)  # (n, H, d)
        s_src = jnp.einsum("nhd,hd->nh", hw, p["a_src"])  # (n, H)
        s_dst = jnp.einsum("nhd,hd->nh", hw, p["a_dst"])
        e = jax.nn.leaky_relu(
            jnp.take(s_src, row_ids, axis=0) + jnp.take(s_dst, col_ids, axis=0),
            negative_slope=0.2,
        )  # (nnz, H)
        # segment softmax over each row's edges (rows sorted)
        e_max = jax.ops.segment_max(
            e, row_ids, num_segments=n, indices_are_sorted=True
        )
        e_max = jnp.where(jnp.isfinite(e_max), e_max, 0.0)
        w = jnp.exp(e - jnp.take(e_max, row_ids, axis=0))
        denom = jax.ops.segment_sum(
            w, row_ids, num_segments=n, indices_are_sorted=True
        )
        alpha = w / jnp.maximum(jnp.take(denom, row_ids, axis=0), 1e-16)
        # weighted aggregation: out_i = sum_j alpha_ij * hw_j
        contrib = alpha[:, :, None] * jnp.take(hw, col_ids, axis=0)
        out = jax.ops.segment_sum(
            contrib, row_ids, num_segments=n, indices_are_sorted=True
        )  # (n, H, d)
        if concat:
            return out.reshape(n, heads * d_out)
        return out.mean(axis=1)

    def apply(params: List[dict], x: jax.Array) -> jax.Array:
        h = jnp.asarray(x)
        for i, p in enumerate(params):
            last = i == len(params) - 1
            h = layer(p, h, concat=not last)
            if not last:
                h = jax.nn.elu(h)
        return h

    return apply
