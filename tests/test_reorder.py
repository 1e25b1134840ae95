import numpy as np
import pytest
import scipy.sparse as sp

from spmm_denseblock_tpu.formats import CSR
from spmm_denseblock_tpu.io import synthetic_powerlaw
from spmm_denseblock_tpu.reorder import (
    permutate,
    invert_permutation,
    check_permutation,
    reorder,
    STRATEGIES,
    bfs,
    rcm_variant,
    max_degree_sort,
    partition_rcm,
)
from spmm_denseblock_tpu.analyze import block_metrics


def _graph(n=400, seed=0):
    return synthetic_powerlaw(n, n * 8, seed=seed)


def test_permutate_preserves_matrix_up_to_relabeling():
    csr = _graph()
    rng = np.random.default_rng(3)
    perm = rng.permutation(csr.n_rows).astype(np.int64)
    out = permutate(perm, csr)
    # dense check: P A P^T
    P = np.zeros((csr.n_rows, csr.n_rows), np.float32)
    P[perm, np.arange(csr.n_rows)] = 1
    np.testing.assert_allclose(out.to_dense(), P @ csr.to_dense() @ P.T, atol=1e-6)


def test_invert_permutation():
    p = np.array([2, 0, 1, 3])
    inv = invert_permutation(p)
    np.testing.assert_array_equal(p[inv], np.arange(4))


def test_check_permutation_rejects_non_bijection():
    with pytest.raises(ValueError):
        check_permutation(np.array([0, 0, 1]), 3)


def test_max_degree_sort_orders_by_degree():
    csr = _graph()
    out, old2new = reorder(csr, "degree")
    deg_new = out.degrees()
    assert np.all(np.diff(deg_new) <= 0)  # descending


def test_bfs_numbers_all_vertices():
    csr = _graph()
    perm = bfs(csr)
    check_permutation(perm, csr.n_rows)
    # vertex 0's neighbors get early numbers if 0 is the first source
    # (multi-source restart semantics from reorder_strategy.cc:68-98)
    assert perm[0] == 0


def test_bfs_matches_naive_queue():
    # exact FIFO-order equivalence against a literal queue implementation
    csr = _graph(n=120, seed=5)
    indptr, indices = np.asarray(csr.indptr), np.asarray(csr.indices)
    n = csr.n_rows
    old2new = np.full(n, -1)
    from collections import deque

    cnt, pos, q = 0, 0, deque()
    while True:
        while pos < n and old2new[pos] != -1:
            pos += 1
        if pos == n:
            break
        old2new[pos] = cnt
        cnt += 1
        q.append(pos)
        while q:
            x = q.popleft()
            for y in indices[indptr[x] : indptr[x + 1]]:
                if old2new[y] == -1:
                    old2new[y] = cnt
                    cnt += 1
                    q.append(y)
    np.testing.assert_array_equal(bfs(csr), old2new)


@pytest.mark.parametrize(
    "strategy", ["degree", "bfs", "rcmk", "rcm", "gorder", "rabbit", "closest"]
)
def test_all_strategies_produce_valid_permutations(strategy):
    csr = _graph(n=200, seed=7)
    out, old2new = reorder(csr, strategy)
    check_permutation(old2new, csr.n_rows)
    assert out.nnz == csr.nnz
    # degree multiset preserved
    np.testing.assert_array_equal(
        np.sort(out.degrees()), np.sort(csr.degrees())
    )


def test_reordering_improves_block_density():
    """The repo's whole thesis: community-aware reordering densifies
    blocks. On the clustered synthetic graph, rcmk/rabbit must beat the
    scrambled original ordering at b=16."""
    csr = _graph(n=2048, seed=1)
    base = block_metrics(csr, (16,))[16]
    for strategy in ("rcmk", "rabbit"):
        out, _ = reorder(csr, strategy)
        m = block_metrics(out, (16,))[16]
        assert m["nnzb"] < base["nnzb"], (strategy, m, base)
        assert m["utilization"] > base["utilization"]


def test_nested_dissection_valid_and_improves_block_structure():
    """In-process ND (the metis_reorder.cpp:116-141 analog, pymetis-free):
    valid permutation; on the clustered graph it must densify blocks over
    a scrambled ordering (the quality property ndmetis supplied the
    reference)."""
    from spmm_denseblock_tpu.reorder import nested_dissection
    from spmm_denseblock_tpu.reorder.base import permutate

    csr = _graph(n=1024, seed=5)
    # scramble so the clustered structure is not already contiguous
    rng = np.random.default_rng(0)
    scramble = rng.permutation(1024).astype(np.int64)
    scrambled = permutate(scramble, csr)

    out, old2new = reorder(scrambled, "ndmetis")
    check_permutation(old2new, 1024)
    assert out.nnz == scrambled.nnz
    base = block_metrics(scrambled, (16,))[16]
    m = block_metrics(out, (16,))[16]
    assert m["nnzb"] < base["nnzb"], (m, base)
    assert m["utilization"] > base["utilization"]

    # separator-last numbering on a path graph: ND of a path splits it
    # with a 1-vertex separator numbered after both halves
    n = 9
    rows = np.concatenate([np.arange(n - 1), np.arange(1, n)])
    cols = np.concatenate([np.arange(1, n), np.arange(n - 1)])
    from spmm_denseblock_tpu.formats.csr import CSR

    path = CSR.from_coo(rows, cols, None, (n, n))
    o2n = nested_dissection(path, leaf_size=2)
    check_permutation(o2n, n)


def test_partition_rcm_groups_partitions_contiguously():
    csr = _graph(n=300, seed=2)
    parts = (np.arange(300) * 7 % 4).astype(np.int64)
    old2new = partition_rcm(csr, parts)
    check_permutation(old2new, 300)
    # new ids of each partition must form a contiguous range
    for p in range(4):
        ids = np.sort(old2new[parts == p])
        assert ids[-1] - ids[0] + 1 == ids.size


def test_registry_rejects_unknown():
    with pytest.raises(KeyError):
        reorder(_graph(), "nope")
    assert "rcmk" in STRATEGIES


def test_reorder_cached_roundtrip(tmp_path):
    """Permutation cache: second call loads the text file (reference's
    tmp/<ds>_<strategy>.txt discipline) and reproduces the same CSR."""
    import numpy as np
    from spmm_denseblock_tpu.formats.csr import random_csr
    from spmm_denseblock_tpu.reorder import reorder_cached

    csr = random_csr(0.05, 60, seed=6, values="ones")
    r1, p1 = reorder_cached(csr, "rcmk", cache_dir=str(tmp_path), tag="t")
    assert (tmp_path / "t_rcmk.txt").exists()
    r2, p2 = reorder_cached(csr, "rcmk", cache_dir=str(tmp_path), tag="t")
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(
        np.asarray(r1.indices), np.asarray(r2.indices)
    )


def test_reorder_per_component():
    """Block-diagonal batch of small graphs: per-component reorder keeps
    components contiguous and intact (ogbg_molhiv discipline)."""
    import numpy as np
    from spmm_denseblock_tpu.formats.csr import CSR
    from spmm_denseblock_tpu.reorder import (
        check_permutation,
        permutate,
        reorder_per_component,
    )
    from spmm_denseblock_tpu.reorder.simple import rcm_variant

    # two 4-cycles and an isolated vertex
    e = [[0, 1], [1, 0], [1, 2], [2, 1], [2, 3], [3, 2], [3, 0], [0, 3],
         [5, 6], [6, 5], [6, 7], [7, 6], [7, 8], [8, 7], [8, 5], [5, 8]]
    csr = CSR.from_edges(np.array(e), 9)
    perm = reorder_per_component(csr, rcm_variant)
    check_permutation(perm, 9)
    # component membership preserved: vertices 0-3 stay in positions 0-3,
    # vertex 4 at position 4, vertices 5-8 in 5-8
    assert sorted(perm[:4]) == [0, 1, 2, 3]
    assert perm[4] == 4
    assert sorted(perm[5:]) == [5, 6, 7, 8]
    out = permutate(perm, csr)
    assert out.nnz == csr.nnz


def test_auto_dispatch_memory_guard(rng):
    """A graph whose BSR-ification exceeds the byte budget must route to
    the hybrid tier instead of materializing the blocks."""
    import numpy as np
    from spmm_denseblock_tpu.formats.csr import random_csr
    from spmm_denseblock_tpu.ops import spmm_plan, spmm_scipy, assert_allclose

    csr = random_csr(0.01, 512, seed=9, values="ones")
    x = rng.standard_normal((512, 8)).astype(np.float32)
    plan = spmm_plan(csr, impl="auto", block_size=64, bsr_bytes_budget=1024)
    assert_allclose(np.asarray(plan(x)), spmm_scipy(csr, x))


def test_auto_dispatch_routes_banded_to_windowed(rng):
    """Memory guard + capture estimate: a banded (reordered-like) graph
    over budget routes to the windowed tier; a scattered one to hybrid."""
    import numpy as np
    from spmm_denseblock_tpu.formats.csr import CSR, random_csr
    from spmm_denseblock_tpu.ops import spmm_plan, spmm_scipy, assert_allclose

    n = 1024
    rows = np.repeat(np.arange(n), 4)
    cols = (rows + np.tile(np.arange(4), n)) % n
    banded = CSR.from_coo(rows, cols, None, (n, n))
    x = rng.standard_normal((n, 8)).astype(np.float32)
    plan = spmm_plan(banded, impl="auto", block_size=64, bsr_bytes_budget=1)
    assert_allclose(np.asarray(plan(x)), spmm_scipy(banded, x))

    scattered = random_csr(0.01, 600, seed=3, values="ones")
    x2 = rng.standard_normal((600, 8)).astype(np.float32)
    plan2 = spmm_plan(scattered, impl="auto", block_size=64, bsr_bytes_budget=1)
    assert_allclose(np.asarray(plan2(x2)), spmm_scipy(scattered, x2))


def test_reorder_cli(tmp_path):
    from spmm_denseblock_tpu.reorder.__main__ import main
    import numpy as np
    from spmm_denseblock_tpu.io.graph_io import load_csr, load_permutation

    rc = main(
        ["ogbn-arxiv", "rcmk", "--scale", "0.005", "--out", str(tmp_path)]
    )
    assert rc == 0
    name = "ogbn_arxiv_s0.005"
    orig = load_csr(str(tmp_path / f"{name}_original"))
    re = load_csr(str(tmp_path / f"{name}_rcmk"))
    assert orig.nnz == re.nnz
    perm = load_permutation(str(tmp_path / f"{name}_rcmk.txt"))
    assert perm.shape[0] == orig.n_rows
    assert main(["ogbn-arxiv", "nope"]) == 2


@pytest.mark.parametrize("strategy", ["rcmk", "bfs", "rabbit", "gorder"])
def test_reordering_improves_block_structure(strategy):
    """The framework's thesis as a regression test: on a scrambled
    community graph, every locality-seeking strategy must improve block
    utilization (nnz per stored block cell) over the scrambled order."""
    import numpy as np
    from spmm_denseblock_tpu.analyze.metrics import block_metrics
    from spmm_denseblock_tpu.formats.csr import CSR
    from spmm_denseblock_tpu.reorder import permutate, reorder

    rng = np.random.default_rng(7)
    n_comm, size = 24, 16
    n = n_comm * size
    # dense-ish communities + sparse inter-community edges, then scramble
    edges = []
    for c in range(n_comm):
        base = c * size
        members = np.arange(base, base + size)
        for _ in range(size * 4):
            u, v = rng.choice(members, 2, replace=False)
            edges.append((u, v))
    for _ in range(n):
        edges.append(tuple(rng.integers(0, n, 2)))
    e = np.array(edges)
    e = np.concatenate([e, e[:, ::-1]])
    scramble = rng.permutation(n)
    e = scramble[e]
    csr = CSR.from_edges(e[e[:, 0] != e[:, 1]], n)

    b = 8
    before = block_metrics(csr, [b])[b]["utilization"]
    rcsr, _ = reorder(csr, strategy)
    after = block_metrics(rcsr, [b])[b]["utilization"]
    # every strategy must materially densify blocks on this graph
    assert after > before * 1.2, (strategy, before, after)


def test_auto_dispatch_fill_amplification_guard(rng):
    """Weakly-structured CSR under the HBM budget must route to the
    scatter-free ELL tier rather than BSR-ify into ~99%-zero blocks."""
    from spmm_denseblock_tpu.formats.csr import random_csr
    from spmm_denseblock_tpu.ops import spmm_plan, spmm_scipy
    from spmm_denseblock_tpu.ops.plan import Plan

    csr = random_csr(0.002, 1024, seed=9, values="ones")  # amp >> 32
    plan = spmm_plan(csr, impl="auto", block_size=128)
    assert isinstance(plan, Plan)
    x = rng.standard_normal((1024, 8)).astype(np.float32)
    got = np.asarray(plan(x))
    np.testing.assert_allclose(got, spmm_scipy(csr, x), atol=1e-4)
