"""Session-3 full-scale runs after the per-chunk-2D ELL storage rework:
1) re-validate proteins + products auto routes (orientation of matsum
   chunks changed — incumbent numbers 91.5 / 1297.8 ms must hold);
2) the blocked ogbl-citation coverage artifact (2.93M nodes / 61M nnz)
   that motivated the rework (monolithic R1 idx vector hit a
   compile-time RESOURCE_EXHAUSTED via XLA's bad 2D refactorization).
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from r2_quarter_ab import run

for ds, label in (
    ("ogbn-proteins", "auto(chunk2d)"),
    ("ogbn-products", "auto(chunk2d)"),
    ("ogbl-citation", "auto(scored)"),
):
    try:
        run(ds, "rabbit", "auto", impl_label=label)
    except Exception as e:
        print(f"[r2s3] {ds} FAILED: {type(e).__name__}: {e}", flush=True)
