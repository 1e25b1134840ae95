from spmm_denseblock_tpu.formats.csr import CSR, random_csr
from spmm_denseblock_tpu.formats.bsr import BSR, random_bsr
from spmm_denseblock_tpu.formats.hybrid import Hybrid
from spmm_denseblock_tpu.formats.windowed import Windowed, divide_windowed

__all__ = [
    "CSR",
    "BSR",
    "Hybrid",
    "Windowed",
    "divide_windowed",
    "random_csr",
    "random_bsr",
]
