"""Connected components (operators/graph.py): correctness on known
graph shapes and convergence in O(log diameter) iterations."""

import pytest

from flo_spark.operators.graph import connected_components


def _components(spark, pairs, **kw):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    out = connected_components(edges, **kw)
    return {r["node"]: r["label"] for r in out.collect()}


def test_chain_collapses_to_min(spark):
    # path 0-1-2-...-9: one component labelled 0
    got = _components(spark, [(i, i + 1) for i in range(9)])
    assert got == {i: 0 for i in range(10)}


def test_disjoint_components(spark):
    got = _components(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_cycle_and_bridge(spark):
    # cycle 5-6-7-5 bridged to 1 via (1,5)
    got = _components(spark, [(5, 6), (6, 7), (7, 5), (1, 5)])
    assert got == {1: 1, 5: 1, 6: 1, 7: 1}


def test_direction_irrelevant(spark):
    # edges given "backwards" — symmetrization handles it
    got = _components(spark, [(3, 0), (7, 3)])
    assert got == {0: 0, 3: 0, 7: 0}


def test_long_chain_converges_within_log_bound(spark):
    # diameter 63: plain propagation would need >60 iterations;
    # pointer jumping must finish well inside max_iter=12
    got = _components(spark, [(i, i + 1) for i in range(63)], max_iter=12)
    assert got == {i: 0 for i in range(64)}


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError):
        _components(spark, [(i, i + 1) for i in range(40)], max_iter=1)


def _union_find(pairs):
    """Independent reference: classic path-compressed union-find."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of each set
    best = {}
    for n in parent:
        r = find(n)
        best[r] = min(best.get(r, n), n)
    return {n: best[find(n)] for n in parent}


def test_random_graphs_match_union_find(spark):
    # differential check against union-find on a deterministic spread of
    # random graphs (dense, sparse, self-loops, duplicate edges)
    import random

    rng = random.Random(7)
    for trial in range(6):
        n_nodes = rng.randint(2, 40)
        n_edges = rng.randint(1, 60)
        pairs = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        assert _components(spark, pairs) == _union_find(pairs), pairs
