"""Connected components: transitive closure correctness (chains,
forests, isolated nodes), convergence on paths longer than one
propagation round, and input normalization (asymmetric / duplicate
edges)."""

from __future__ import annotations

import pytest

from oups_spark.operators.components import (
    connected_components,
    neardup_clusters,
)


def _run(spark, node_ids, edge_pairs, **kw):
    nodes = spark.createDataFrame([(i,) for i in node_ids], "id: long")
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_pairs] or [(None, None)],
        "id_a: long, id_b: long",
    )
    if not edge_pairs:
        edges = edges.filter("id_a IS NOT NULL")
    out = connected_components(nodes, edges, **kw)
    return dict(out.collect())


def test_chain_is_one_component(spark):
    # a-b, b-c, c-d: transitivity must close the chain even though
    # (a, d) was never an edge
    comp = _run(spark, [1, 2, 3, 4], [(1, 2), (2, 3), (3, 4)])
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1}


def test_forest_and_isolated_nodes(spark):
    comp = _run(spark, [1, 2, 3, 4, 5, 6, 7], [(2, 1), (6, 7)])
    assert comp == {1: 1, 2: 1, 3: 3, 4: 4, 5: 5, 6: 6, 7: 6}


def test_long_path_converges(spark):
    # 40-node path: diameter 39 >> round count; pointer jumping must
    # still converge (labels travel ~2^r hops per round)
    n = 40
    comp = _run(spark, range(n), [(i, i + 1) for i in range(n - 1)])
    assert comp == {i: 0 for i in range(n)}


def test_asymmetric_duplicate_edges_normalized(spark):
    comp = _run(spark, [1, 2, 3], [(3, 1), (1, 3), (3, 1), (2, 3)])
    assert comp == {1: 1, 2: 1, 3: 1}


def test_no_edges_all_singletons(spark):
    comp = _run(spark, [5, 9], [])
    assert comp == {5: 5, 9: 9}


def test_neardup_clusters_canonical_flag(spark):
    docs = spark.createDataFrame([(i,) for i in [10, 20, 30, 40]], "doc_id: long")
    pairs = spark.createDataFrame([(20, 40)], "id_a: long, id_b: long")
    out = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in neardup_clusters(docs, pairs).collect()
    }
    assert out == {
        10: (10, True),
        20: (20, True),
        30: (30, True),
        40: (20, False),
    }


# ---------------------------------------------------------- property
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _union_find(n: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical representative = min node id in component
    comp: dict[int, list[int]] = {}
    for i in range(n):
        comp.setdefault(find(i), []).append(i)
    return {i: min(members) for members in comp.values() for i in members}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=1, max_value=25),
    edge_idx=st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)),
        max_size=35,
    ),
)
def test_components_match_union_find(spark, n, edge_idx):
    """Any random graph (self-loops, duplicates, asymmetry included)
    must agree with a sequential union-find oracle."""
    edges = [(a % n, b % n) for a, b in edge_idx]
    got = _run(spark, range(n), edges)
    assert got == _union_find(n, edges)


def test_distributed_path_matches_driver_shortcut(spark):
    # force the iterative distributed loop (threshold=0) on shapes
    # that stress it: long path (pointer jumping), forest + isolated,
    # asymmetric duplicates — must agree with the union-find path
    cases = [
        (range(40), [(i, i + 1) for i in range(39)]),
        ([1, 2, 3, 4, 5, 6, 7], [(2, 1), (6, 7)]),
        ([1, 2, 3], [(3, 1), (1, 3), (3, 1), (2, 3)]),
    ]
    for node_ids, edges in cases:
        fast = _run(spark, node_ids, edges)
        dist = _run(spark, node_ids, edges, driver_edge_threshold=0)
        assert dist == fast


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=1, max_value=25),
    edge_idx=st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)),
        max_size=35,
    ),
)
def test_distributed_components_match_union_find(spark, n, edge_idx):
    edges = [(a % n, b % n) for a, b in edge_idx]
    got = _run(spark, range(n), edges, driver_edge_threshold=0)
    assert got == _union_find(n, edges)


def test_leakage_safe_splits_no_straddle_and_fractions(spark):
    """Near-dup pairs must land whole-cluster in ONE split; the hash
    split must be deterministic and roughly respect 80/10/10."""
    import hashlib

    from oups_spark.operators.components import leakage_safe_splits

    n = 400
    docs = spark.range(n).selectExpr("id AS doc_id")
    # chain pairs (i, i+1) for i % 10 == 0 -> clusters of size 2
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, n - 1, 10)], "id_a long, id_b long"
    )
    out = leakage_safe_splits(docs, pairs, id_col="doc_id").collect()
    assert len(out) == n
    by_id = {r["doc_id"]: r for r in out}
    # paired docs share cluster AND split
    for i in range(0, n - 1, 10):
        assert by_id[i]["cluster_id"] == by_id[i + 1]["cluster_id"]
        assert by_id[i]["split"] == by_id[i + 1]["split"]
    # split is the documented portable hash of the cluster id
    for r in out:
        u = int(
            hashlib.md5(f"split:{r['cluster_id']}".encode()).hexdigest()[:8], 16
        ) / 2.0**32
        want = "train" if u < 0.8 else ("valid" if u < 0.9 else "test")
        assert r["split"] == want
    # fractions roughly 80/10/10 over distinct clusters
    from collections import Counter

    c = Counter(r["split"] for r in out)
    assert 0.7 < c["train"] / n < 0.9
    assert c["valid"] > 0 and c["test"] > 0
