"""Multi-host (pod-slice) setup helpers.

The reference is single-process (SURVEY.md §2.7); this module carries the
N>=2-hosts story from BASELINE.json. The runtime model is JAX
multi-controller SPMD: every host runs the SAME program, sees the global
mesh, and owns its local shard of every distributed array.

Launch pattern (per host):

    python -c "
    from spmm_denseblock_tpu.parallel.multihost import initialize, pod_mesh
    initialize()                      # TPU pod: auto-discovers peers
    mesh = pod_mesh()                 # ('row','col') over ALL chips
    ... same single-host code: dist_bsr_spmm_plan(bsr, mesh=mesh) ...
    "

Design notes for the sparse layer specifically:
- The reordering permutation is computed host-side and is DETERMINISTIC
  (seeded, see reorder/), so every host derives the same permutation
  from the same graph file — no broadcast needed; this mirrors the
  reference's replicate-preprocessing-per-run discipline.
- `shard_bsr` slices by block-row stripe; with a pod mesh each host
  device_puts only its addressable stripes (jax.device_put with a
  NamedSharding over the global mesh does exactly this).
- Collectives in parallel/spmm.py are mesh-axis collectives: on a pod
  slice the "row" all-gather/ppermute rides ICI within the slice and DCN
  only at slice boundaries, chosen by the XLA partitioner from the mesh
  topology — nothing in the SpMM code changes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

# jax.distributed.initialize must run before ANY backend-touching JAX
# call, so we cannot probe jax.process_count() to detect prior init
# (the probe itself initializes the backend).  Track it ourselves and
# additionally tolerate the "already initialized" error for the case
# where the caller ran initialize() through another code path.
_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with TPU auto-discovery defaults.

    On Cloud TPU pods all three arguments are discovered from the
    metadata service; on CPU/GPU clusters pass them explicitly (or set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)."""
    global _initialized
    if _initialized:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # Re-raise unless this is the benign double-init case.
        if "already initialized" not in str(e).lower():
            raise
    _initialized = True


def pod_mesh(
    row_parallelism: Optional[int] = None,
    axis_names: Tuple[str, str] = ("row", "col"),
) -> Mesh:
    """2D mesh over ALL devices in the slice (every process must call
    this with the same arguments). row_parallelism defaults to the
    device count (pure stripe parallelism, col=1)."""
    devs = jax.devices()  # global across processes
    n = len(devs)
    rows = row_parallelism or n
    if n % rows != 0:
        raise ValueError(f"{n} devices not divisible by row_parallelism={rows}")
    return Mesh(np.asarray(devs).reshape(rows, n // rows), axis_names)


def is_coordinator() -> bool:
    return jax.process_index() == 0
