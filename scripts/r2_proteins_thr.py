"""Proteins threshold micro-sweep with quarter-bucket remainders.

Quarter buckets + the 0.03-threshold hybrid gave 206.3 ms; cheaper ELL
slots shift the dense/remainder break-even, so probe one step lower and
the scorer's own pick. Appends to tpu_v5e_fullscale_r2.jsonl.
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from r2_quarter_ab import run

if __name__ == "__main__":
    for thr in (0.02, 0.015):
        run("ogbn-proteins", "rabbit", "hybrid", thr=thr, bucket="quarter")
