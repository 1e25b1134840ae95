from spmm_denseblock_tpu.convert.csr2bsr import csr_to_bsr, bsr_to_csr
from spmm_denseblock_tpu.convert.divide import divide, auto_threshold
from spmm_denseblock_tpu.convert.pack import repack_bsr, round_up, pad_dense_rows

__all__ = [
    "csr_to_bsr",
    "bsr_to_csr",
    "divide",
    "auto_threshold",
    "repack_bsr",
    "round_up",
    "pad_dense_rows",
]
