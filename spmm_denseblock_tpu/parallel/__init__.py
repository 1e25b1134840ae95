from spmm_denseblock_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_1d,
    row_sharding,
    replicated,
)
from spmm_denseblock_tpu.parallel.shard import (
    ShardedBSR,
    ShardedCSR,
    shard_bsr,
    shard_csr,
    bucket_by_col_chunk,
    shard_stats,
)
from spmm_denseblock_tpu.parallel.multihost import (
    initialize,
    pod_mesh,
    is_coordinator,
)
from spmm_denseblock_tpu.parallel.spmm import (
    dist_bsr_spmm_plan,
    dist_csr_spmm_ell_plan,
    dist_csr_spmm_plan,
    dist_hybrid_spmm_plan,
    dist_windowed_spmm_plan,
    dist_sddmm_plan,
    balanced_block_row_permutation,
)

__all__ = [
    "make_mesh",
    "make_mesh_1d",
    "row_sharding",
    "replicated",
    "ShardedBSR",
    "ShardedCSR",
    "shard_bsr",
    "shard_csr",
    "bucket_by_col_chunk",
    "shard_stats",
    "dist_bsr_spmm_plan",
    "dist_csr_spmm_ell_plan",
    "dist_csr_spmm_plan",
    "dist_hybrid_spmm_plan",
    "dist_windowed_spmm_plan",
    "dist_sddmm_plan",
    "balanced_block_row_permutation",
    "initialize",
    "pod_mesh",
    "is_coordinator",
]
