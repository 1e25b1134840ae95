"""Chip session 3: scratch-resident bf16 probe. RESULT (12:56
2026-08-20): identical to the pipelined resident kernel at every G
(5.61/5.80/5.96 ms) — the single-buffered dense operand was never
serializing the pipeline; recorded negative in ROUND4_NOTES.md.
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
    print(f"[session3 {time.strftime('%T')}] {m}", flush=True)


def main():
    claim_or_exit(log)
    from r4_resident_probe_lite import run_ab

    log("scratch-resident bf16 A/B")
    run_ab("bf16_g32_s,bf16_g16_s,bf16_g8_s", repeats=3)
    log("queue done")


if __name__ == "__main__":
    main()
