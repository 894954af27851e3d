"""Iterative graph operators: connected components over near-duplicate
pair edges → duplicate CLUSTERS.

Pair generators (MinHash-LSH dd3, SimHash dd4, cosine dd5) emit EDGES; a
real corpus dedup keeps one representative per connected COMPONENT (the
pair set is transitive in intent but not in form: a~b, b~c often arrives
without a~c). This module closes that gap with min-label propagation —
each node repeatedly adopts the smallest label among itself and its
neighbors until fixpoint, which is exactly the component-minimum
(deterministic representative: smallest doc id in the cluster).

Scale shape (10^9 nodes / 10^10 edges):

- each iteration is one join (edges ⨝ labels, shuffled by node id) + one
  min-aggregate — all hash-partitioned on the SAME key, so AQE reuses the
  partitioning across the chain;
- iteration count is bounded by the component DIAMETER, and near-dup
  clusters are dense and tiny (diameter ≤ a handful) — not the
  pathological long-path case (for which large-star/small-star reduces
  rounds to O(log n); that refinement drops in behind the same signature);
- ``localCheckpoint`` every iteration truncates the lineage chain —
  without it the plan doubles per round and iteration K replays all K-1
  predecessors (driver OOM on the plan, executor recompute storms at
  scale; a cluster deployment would use a reliable ``checkpoint`` dir);
- convergence is detected with a changed-row count per round — one tiny
  job on already-materialized frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Min-label propagation to fixpoint. Returns (node, label) where label
    is the smallest node id in the component. Raises if ``max_iter`` rounds
    don't converge (a diameter larger than max_iter — raise it or switch to
    the star-contraction variant)."""
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        # materialize ONCE: the edge frame is re-joined every round, and for
        # cc1/dp3 it is the entire MinHash-LSH pair pipeline — without this
        # a d-round convergence pays (d+1)× the LSH cost
        .localCheckpoint()
    )
    labels = nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label")).localCheckpoint()
    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und["b"] == labels["node"])
            .select(F.col("a").alias("node"), "label")
        )
        new_labels = (
            labels.unionByName(neighbor_min)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()  # truncate lineage: plan size stays O(1) per round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def duplicate_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, cluster_rep) for EVERY document — singletons represent
    themselves; near-dup clusters collapse to their smallest id. The
    keep-set of a corpus dedup is then ``WHERE doc_id = cluster_rep``
    (exactly one survivor per cluster, regardless of how the pair list
    chained)."""
    labels = connected_components(
        docs.select(id_col), pairs, id_col=id_col, src_col="id_a", dst_col="id_b"
    )
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_rep"))
