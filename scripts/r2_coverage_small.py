"""Remaining dataset-coverage artifacts: ogbl-collab (235k/2.4M) and
ogbl-ddi (4.3k/2.1M) through the auto router at full scale, completing
the 7-dataset table (arxiv/proteins/products/ppa/citation done).
Appends to benchmarks/tpu_v5e_fullscale_r2.jsonl."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from r2_quarter_ab import run

for ds in ("ogbl-collab", "ogbl-ddi"):
    try:
        run(ds, "rabbit", "auto", impl_label="auto(scored)")
    except Exception as e:
        print(f"[coverage] {ds} FAILED: {type(e).__name__}: {e}", flush=True)
