"""Round-5 chip session 8: dist int8 group-scale parity re-pin."""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from claim_guard import claim_or_exit


def log(m):
    print(f"[r5s8 {time.strftime('%T')}] {m}", flush=True)


def main():
    claim_or_exit(log)
    log("dist parity r5 re-pin (int8 group-scale stripes)")
    import r5_dist_parity

    r5_dist_parity.main()
    log("queue done")


if __name__ == "__main__":
    main()
