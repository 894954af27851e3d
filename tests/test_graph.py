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
