"""Chip session 5: row-PAIR resident bf16 probe — halve the step count
(the ~1.4 us/step residual is the remaining bound at G=32) by packing
two block-rows per grid step with statically-split slot halves.
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
    print(f"[session5 {time.strftime('%T')}] {m}", flush=True)


def main():
    claim_or_exit(log)
    from r4_resident_probe_lite import run_ab

    log("row-pair resident bf16 A/B")
    run_ab("bf16_g32_p,bf16_g16_p", repeats=3)
    log("queue done")


if __name__ == "__main__":
    main()
