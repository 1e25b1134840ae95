"""Meancol row-sort A/B at full products scale (background TPU job).

The products ELL remainder is per-index gather-bound and the big-table
rate looks DRAM-paging-bound (tpu_v5e_gather_floor.jsonl: 2.6 ns/idx at
64 MB tables -> 11.5 at 1.25 GB). row_sort="meancol" orders rows inside
each degree class by mean neighbor id, making the gather's index stream
approximately ascending — a free host-side lever (the position map
restores caller order). Incumbent: products rabbit quarter+scan bf16
1297.8 ms. Appends to benchmarks/tpu_v5e_fullscale_r2.jsonl with a
"row_sort" field.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from r2_quarter_ab import run

t0 = time.time()
run("ogbn-products", "rabbit", "csr_ell", bucket="quarter",
    impl_label="csr_ell", row_sort="meancol")
# proteins incumbent 91.5 ms = hybrid thr=0.02 quarter; meancol on the
# valued remainder (small-table regime — expect little, measures the
# regime boundary)
run("ogbn-proteins", "rabbit", "hybrid", thr=0.02, bucket="quarter",
    row_sort="meancol")
print(f"[meancol-ab] done in {time.time()-t0:.0f}s", flush=True)
