"""transB measurement axis (reference test_bsrmm.cu sweeps transB
{0,1}): time the column-major-operand case (entry transpose fused with
the plan) vs row-major at the headline-relevant configs. Appends to
benchmarks/tpu_v5e_bsrmm_transb.jsonl."""
import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spmm_denseblock_tpu.bench.harness import bench_synthetic_bsr

OUT = "/root/repo/benchmarks/tpu_v5e_bsrmm_transb.jsonl"
for impl in ("bsr_pallas", "bsr_xla"):
    for dim in (128, 512):
        for transb in (0, 1):
            rec = bench_synthetic_bsr(2e-2, 128, dim, impl=impl,
                                      transb=transb)
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(f"[transb] {impl} dim={dim} transb={transb}: "
                  f"{rec['ms']:.2f} ms ({rec['gflops']:.0f} GF/s)",
                  flush=True)
