"""Round-5: does the v5e MXU actually run int8 x int8 -> int32 at 2x
the bf16 rate through this toolchain?

The int8 tier's MFU/SoL fields assume PEAK_INT8 = 2 x PEAK_BF16
(394.8 TF/s). But the shipped group-scale kernel still measures only
~27% of its schedule bandwidth SoL with ~1.7 ms unexplained by bytes +
steps — exactly what an int8-at-bf16-rate MXU would explain
(MXU 2.26 ms at 197 TF/s + bytes ~0.94 serial ~= the measured 3.42).

Probe: dense (8192, 8192) @ (8192, 512) as jnp.dot with
preferred_element_type, int8 vs bf16 vs int8->int32, 3 repeats. If the
int8/bf16 ratio is ~1.0, the tier's peak/MFU fields are mislabeled and
the artifacts need a correction note; if ~0.5 ms ratio (2x), the int8
kernel has a real unexplained gap.

Appends benchmarks/kernel_probe_r5.jsonl.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

OUT = "/root/repo/benchmarks/kernel_probe_r5.jsonl"


def record(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as fh:
        fh.write(json.dumps(kw) + "\n")
    print(json.dumps({k: v for k, v in kw.items() if k != "ts"}),
          flush=True)


def main():
    from spmm_denseblock_tpu.bench.timing import time_repeats

    M = K = 8192
    N = 4096
    flops = 2.0 * M * K * N
    key = jax.random.PRNGKey(0)
    a_f = jax.random.normal(key, (M, K), jnp.float32)
    b_f = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.float32)
    cases = {
        "mxu_bf16": (
            a_f.astype(jnp.bfloat16), b_f.astype(jnp.bfloat16),
            jnp.float32,
        ),
        "mxu_int8_int32": (
            (a_f * 10).astype(jnp.int8), (b_f * 10).astype(jnp.int8),
            jnp.int32,
        ),
    }
    for label, (a, b, acc) in cases.items():
        a = jax.device_put(a)
        b = jax.device_put(b)

        @jax.jit
        def mm(x, _a=a, _acc=acc):
            return jnp.dot(
                _a, x, preferred_element_type=_acc
            ).astype(jnp.float32)

        t = time_repeats(mm, b, repeats=5)
        record(
            kind="kernel_probe", label=label, ms=t["secs"] * 1e3,
            ms_spread=[t["secs_min"] * 1e3, t["secs_max"] * 1e3],
            spread_warn=bool(t.get("spread_warn", False)),
            tflops=flops / t["secs"] / 1e12, repeats=5,
            shape=[M, K, N],
        )


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        print(f"[mxu8] FAILED: {traceback.format_exc(limit=5)}", flush=True)
        sys.exit(1)
