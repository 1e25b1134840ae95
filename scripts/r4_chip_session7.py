"""Chip session 7: validate the production row-group bf16 plan
(bench.py in-process) — probe said 5.18 ms / 68.5 TF/s at R=4.
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
    print(f"[session7 {time.strftime('%T')}] {m}", flush=True)


def main():
    claim_or_exit(log)
    log("bench.py tiers (bf16 -> row-group resident R=4)")
    import bench

    bench.main()
    log("queue done")


if __name__ == "__main__":
    main()
