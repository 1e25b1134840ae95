"""Round-5 chip session 16: bf16x3/f32 sorted-resident probe."""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from claim_guard import claim_or_exit


def log(m):
    print(f"[r5s16 {time.strftime('%T')}] {m}", flush=True)


def main():
    claim_or_exit(log)
    log("bf16x3/f32 sorted-resident probe")
    import r5_bf16x3_resident_probe

    r5_bf16x3_resident_probe.main()
    log("queue done")


if __name__ == "__main__":
    main()
