"""Round-5 chip session 19: closing micro-grid."""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from claim_guard import claim_or_exit


def log(m):
    print(f"[r5s19 {time.strftime('%T')}] {m}", flush=True)


def main():
    claim_or_exit(log)
    log("final cells")
    import r5_final_cells

    r5_final_cells.main()
    log("queue done")


if __name__ == "__main__":
    main()
