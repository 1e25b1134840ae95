"""Chip session 6: row-group sweep — R=4 bf16 (row-pair already won:
5.61 -> 5.29 ms) and int8 row-groups (the resident+pair combination
may beat the 3.40 ms gather record once steps halve).
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
    print(f"[session6 {time.strftime('%T')}] {m}", flush=True)


def main():
    claim_or_exit(log)
    from r4_resident_probe_lite import run_ab

    log("row-group R sweep")
    run_ab("bf16_g32_p4,int8_g32_p,int8_g32_p4,int8_g16_p", repeats=3)
    log("queue done")


if __name__ == "__main__":
    main()
