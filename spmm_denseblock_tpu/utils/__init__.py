from spmm_denseblock_tpu.utils.profiling import (
    trace,
    annotate,
    device_info,
    roofline,
)

__all__ = ["trace", "annotate", "device_info", "roofline"]
