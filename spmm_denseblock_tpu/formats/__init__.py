from spmm_denseblock_tpu.formats.csr import CSR, random_csr
from spmm_denseblock_tpu.formats.bsr import BSR, random_bsr
from spmm_denseblock_tpu.formats.hybrid import Hybrid

__all__ = ["CSR", "BSR", "Hybrid", "random_csr", "random_bsr"]
