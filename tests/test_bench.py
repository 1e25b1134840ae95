"""Bench harness smoke tests (CPU mesh; tiny configs, XLA impls only —
interpret-mode Pallas is too slow to time here)."""

import json

import numpy as np

from spmm_denseblock_tpu.bench import (
    bench_graph,
    bench_scaling,
    bench_synthetic_bsr,
    bench_synthetic_csr,
)


def test_bench_synthetic_bsr_record():
    rec = bench_synthetic_bsr(0.05, 16, 32, impl="bsr_xla", n_block_rows=16)
    assert rec["gflops"] > 0 and rec["ms"] > 0
    assert 0 < rec["block_density"] <= 1
    assert rec["intensity_flop_per_byte"] > 0
    json.dumps(rec)


def test_bench_synthetic_csr_record():
    rec = bench_synthetic_csr(0.01, 16, impl="csr_xla", n_rows=512)
    assert rec["nnz_per_s"] > 0
    json.dumps(rec)


def test_bench_graph_record():
    rec = bench_graph(
        "ogbn-arxiv", strategy="rcmk", block_size=32, dim=16,
        impl="hybrid", scale=0.002,
    )
    assert rec["nnz_per_s"] > 0
    assert rec["strategy"] == "rcmk"
    assert "dense_nnzb" in rec
    json.dumps(rec)


def test_bench_scaling_efficiency():
    rec = bench_scaling([1, 2, 4], p=0.05, block_size=16, dim=32, n_block_rows=32)
    assert [p["devices"] for p in rec["points"]] == [1, 2, 4]
    for p in rec["points"]:
        assert p["nnz_per_s"] > 0
    json.dumps(rec)
