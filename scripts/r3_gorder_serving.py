"""Does gorder's ordering quality carry to serving speed?

The round-3 quality audit measured gorder's hybrid capture on full
products at 23.7M nnz vs rcmk's 993k and higher avg block fill — but
every full-scale serving number on record uses rabbit (or rcmk).
Better community locality should mean lower U/S in the two-level
compaction model and therefore faster compact ELL serving. This runs
the full products + citation auto route under gorder ordering
(bf16, plus products int8), same configs as the dataset matrix.

Appends benchmarks/dataset_matrix_r3.jsonl (strategy="gorder").
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from r3_dataset_matrix import run  # noqa: E402

if __name__ == "__main__":
    for ds in ("ogbn-products", "ogbl-citation"):
        try:
            run(ds, "gorder")
        except Exception as e:
            print(f"[gorder-serving] {ds} bf16 FAILED: "
                  f"{type(e).__name__}: {e}", flush=True)
    try:
        run("ogbn-products", "gorder", dtype="int8", label="auto(int8)")
    except Exception as e:
        print(f"[gorder-serving] products int8 FAILED: "
              f"{type(e).__name__}: {e}", flush=True)
