"""Round-5 chip session 12: user-facing example drives on the chip
(serve_spmm + train_gcn at small scale), run IN-PROCESS (one chip
lease) — end-to-end verification that the r5 defaults serve the
public API the way a user calls it."""

import runpy
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from claim_guard import claim_or_exit


def log(m):
    print(f"[r5s12 {time.strftime('%T')}] {m}", flush=True)


def main():
    claim_or_exit(log)
    for script, argv in (
        ("examples/serve_spmm.py", ["--scale", "0.1"]),
        ("examples/train_gcn.py", ["--scale", "0.05", "--epochs", "3"]),
    ):
        log(f"{script} {' '.join(argv)}")
        old = sys.argv
        sys.argv = [script] + argv
        try:
            runpy.run_path(f"/root/repo/{script}", run_name="__main__")
        except SystemExit as e:
            if e.code not in (0, None):
                log(f"EXIT {e.code}")
        finally:
            sys.argv = old
    log("queue done")


if __name__ == "__main__":
    main()
