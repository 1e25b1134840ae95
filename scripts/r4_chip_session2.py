"""Chip session 2: validate the post-A/B policy + int8 epilogue fusion
(bench.py in-process; see scripts/claim_guard.py for the one-claim
rationale). Ran 12:41-12:47 2026-08-20: f32 23.6 / bf16x3 30.7 /
bf16 59.4 / int8 100.9 TF/s.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from claim_guard import claim_or_exit


def log(m):
    print(f"[session2 {time.strftime('%T')}] {m}", flush=True)


def main():
    claim_or_exit(log)
    log("bench.py tiers in-process (policy: resident bf16-only @ pow2 "
        "group; int8 epilogue fused)")
    import bench

    bench.main()
    log("queue done")


if __name__ == "__main__":
    main()
