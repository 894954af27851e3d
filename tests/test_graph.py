"""Connected-components / duplicate-cluster tests: planted chains, path
convergence, singletons, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otel_kafka_pg_spark.operators.graph import connected_components, duplicate_clusters


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def _pairs(spark, pairs):
    return spark.createDataFrame(pairs or [(None, None)], "id_a long, id_b long").filter(
        F.col("id_a").isNotNull()
    )


def _clusters(spark, ids, pairs):
    out = duplicate_clusters(_nodes(spark, ids), _pairs(spark, pairs))
    return {r["doc_id"]: r["cluster_rep"] for r in out.collect()}


def test_chain_is_one_cluster(spark):
    # a~b, b~c WITHOUT a~c: transitive closure must still merge all three —
    # the case a greedy drop-id_b-of-each-pair scheme cannot express
    got = _clusters(spark, [1, 2, 3, 4, 5], [(1, 2), (2, 3), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_singletons_represent_themselves(spark):
    got = _clusters(spark, [10, 20, 30], [])
    assert got == {10: 10, 20: 20, 30: 30}


def test_long_path_converges(spark):
    # worst-case diameter for min-propagation: a 12-node path
    ids = list(range(12))
    got = _clusters(spark, ids, [(i, i + 1) for i in range(11)])
    assert all(got[i] == 0 for i in ids)


def test_edge_direction_is_irrelevant(spark):
    # labels must flow against edge orientation too (9,8): min is on the dst side
    got = _clusters(spark, [7, 8, 9], [(9, 8), (8, 7)])
    assert got == {7: 7, 8: 7, 9: 7}


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            _nodes(spark, list(range(6))),
            _pairs(spark, [(i, i + 1) for i in range(5)]).selectExpr("id_a as src", "id_b as dst"),
            id_col="doc_id",
            max_iter=1,
        )


def test_keep_set_is_one_per_cluster(spark):
    got = _clusters(spark, [1, 2, 3, 4, 5, 6], [(1, 2), (2, 3), (5, 6)])
    keep = {d for d, rep in got.items() if d == rep}
    assert keep == {1, 4, 5}  # exactly one survivor per component


# --- large-star/small-star (algorithm="star") -------------------------------


def _star_labels(spark, ids, pairs, max_iter=30, stats=None):
    out = connected_components(
        _nodes(spark, ids),
        _pairs(spark, pairs),
        id_col="doc_id",
        src_col="id_a",
        dst_col="id_b",
        algorithm="star",
        max_iter=max_iter,
        stats=stats,
    )
    return {r["node"]: r["label"] for r in out.collect()}


def test_star_matches_label_prop_on_mixed_graph(spark):
    ids = list(range(20))
    pairs = [(1, 2), (2, 3), (3, 1), (5, 9), (9, 12), (14, 15), (17, 18), (18, 19)]
    assert _star_labels(spark, ids, pairs) == _clusters(spark, ids, pairs)


def test_star_chain_of_1000_converges_in_log_rounds(spark):
    """The adversarial case the r3 verdict named: a 1000-node path needs
    ~999 label-propagation rounds but must collapse in O(log n) star
    rounds — gate at ceil(log2(1000)) + 4 = 14 (measured: far fewer)."""
    import math

    n = 1000
    stats = {}
    got = _star_labels(spark, list(range(n)), [(i, i + 1) for i in range(n - 1)], stats=stats)
    assert all(got[i] == 0 for i in range(n))
    assert stats["rounds"] <= math.ceil(math.log2(n)) + 4, stats


def test_star_singletons_and_empty_edges(spark):
    assert _star_labels(spark, [3, 7, 11], []) == {3: 3, 7: 7, 11: 11}


def test_star_edge_direction_irrelevant(spark):
    assert _star_labels(spark, [7, 8, 9], [(9, 8), (8, 7)]) == {7: 7, 8: 7, 9: 7}


def test_star_duplicate_and_self_edges_tolerated(spark):
    got = _star_labels(spark, [1, 2, 3], [(1, 2), (2, 1), (2, 2), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_star_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _star_labels(spark, list(range(64)), [(i, i + 1) for i in range(63)], max_iter=1)


def test_random_graphs_match_union_find(spark):
    """Seeded random graphs (sparse, dense, with isolated nodes) against a
    pure-Python union-find ground truth — BOTH algorithms must reproduce the
    exact min-id component labeling. Union always attaches the larger root
    under the smaller, so every root is its component's minimum id."""
    import random

    for seed, n, m in [(0, 40, 20), (1, 60, 90), (2, 80, 40), (3, 50, 200)]:
        rng = random.Random(seed)
        ids = list(range(n))
        pairs = [(a, b) for a, b in ((rng.randrange(n), rng.randrange(n)) for _ in range(m)) if a != b]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        truth = {x: find(x) for x in ids}

        assert _clusters(spark, ids, pairs) == truth, f"label_prop seed={seed}"
        assert _star_labels(spark, ids, pairs) == truth, f"star seed={seed}"
