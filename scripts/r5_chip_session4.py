"""Round-5 chip session 4: gorder floor decision (VERDICT r4 #6) +
order-sensitive route sweep (VERDICT r4 #3)."""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from claim_guard import claim_or_exit


def log(m):
    print(f"[r5s4 {time.strftime('%T')}] {m}", flush=True)


def main():
    claim_or_exit(log)
    log("order routes sweep")
    import r5_order_routes

    r5_order_routes.main()
    log("gorder floor decision")
    import importlib

    gf = importlib.import_module("r4_gorder_floor")
    gf.main()
    log("queue done")


if __name__ == "__main__":
    main()
