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
  pathological long-path case, for which ``algorithm="star"`` switches to
  alternating large-star/small-star contraction (Kiveris et al., MapReduce
  and Beyond '14), converging in O(log n) rounds on a chain instead of n;
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
    algorithm: str = "label_prop",
    stats: dict | None = None,
) -> DataFrame:
    """Connected components: (node, label) where label is the smallest node
    id in the component.

    ``algorithm="label_prop"`` (default): min-label propagation — rounds
    bounded by component diameter, the right choice for near-dup clusters
    (dense, tiny). ``algorithm="star"``: alternating large-star/small-star
    contraction — O(log n) rounds even on adversarial long chains. Both
    raise if ``max_iter`` rounds don't converge; pass ``stats={}`` to get
    ``stats["rounds"]`` back."""
    if algorithm == "star":
        return _connected_components_star(nodes, edges, id_col, src_col, dst_col, max_iter, stats)
    if algorithm != "label_prop":
        raise ValueError(f"unknown algorithm {algorithm!r} (label_prop | star)")
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        # materialize ONCE: the edge frame is re-joined every round, and for
        # cc1/dp3 it is the entire MinHash-LSH pair pipeline — without this
        # a d-round convergence pays (d+1)× the LSH cost
        .localCheckpoint()
    )
    labels = nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label")).localCheckpoint()
    for _round in range(max_iter):
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
            if stats is not None:
                stats["rounds"] = _round + 1
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def _connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str,
    src_col: str,
    dst_col: str,
    max_iter: int,
    stats: dict | None = None,
) -> DataFrame:
    """Alternating large-star/small-star contraction (Kiveris et al. 2014,
    "Connected Components in MapReduce and Beyond"), the O(log n)-round
    variant for adversarial chain/path components where label propagation
    needs diameter rounds.

    Edges are kept directed child→parent (u > v always). One round:

    - **large-star**: every node u computes m = min(Γ(u) ∪ {u}); each
      STRICTLY LARGER neighbor v > u re-points to m — long tails fold onto
      small labels in parallel;
    - **small-star**: every node u re-points its smaller neighbors (and
      itself) to the minimum of that set — flattens local stars.

    Each step is a groupBy-min + a join on the grouping key (same shuffle
    key chain as label_prop) over the EDGE set; at fixpoint the edge set is
    a star forest (child, component-min), which large-star and small-star
    both map to itself — convergence is edge-set stability (count equal +
    exceptAll empty on already-checkpointed frames). ``localCheckpoint``
    per step keeps the plan O(1) per round."""
    e = (
        edges.select(
            F.greatest(F.col(src_col), F.col(dst_col)).alias("u"),
            F.least(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    rounds = 0
    for _ in range(max_iter):
        if e.isEmpty():
            break
        # large-star: und(x, n) = both directions; m_x = min(Γ(x) ∪ {x});
        # each neighbor n > x re-points to m_x. Every edge (hi, lo) appears
        # once with x=lo (hi > lo → emitted) and once with x=hi (dropped),
        # so the output edge count never grows.
        und = e.select(F.col("u").alias("x"), F.col("v").alias("n")).union(
            e.select(F.col("v").alias("x"), F.col("u").alias("n"))
        )
        mins = und.groupBy("x").agg(F.min("n").alias("mn"))
        mins = mins.select("x", F.least(F.col("x"), F.col("mn")).alias("m"))
        e1 = (
            und.join(mins, "x")
            .filter(F.col("n") > F.col("x"))
            .select(F.col("n").alias("u"), F.col("m").alias("v"))  # n > x ≥ m ⇒ u > v
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # small-star: per u over its smaller neighbors N = {v : (u,v)},
        # m = min(N); re-point u and every v ∈ N \ {m} to m.
        mins2 = e1.groupBy("u").agg(F.min("v").alias("m"))
        children = (
            e1.join(mins2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))  # v > m ⇒ directed ok
        )
        e2 = (
            children.union(mins2.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        rounds += 1
        if e2.count() == e.count() and e2.exceptAll(e).count() == 0:
            e = e2
            break
        e = e2
    else:
        raise RuntimeError(f"star contraction did not converge in {max_iter} rounds")
    if stats is not None:
        stats["rounds"] = rounds
    # fixpoint edge set is (child, component-min); roots and singletons
    # label themselves
    labels = nodes.select(F.col(id_col).alias("node")).join(
        e.select(F.col("u").alias("node"), F.col("v").alias("_lbl")), "node", "left"
    )
    return labels.select("node", F.coalesce("_lbl", F.col("node")).alias("label"))


def duplicate_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id", algorithm: str = "label_prop"
) -> DataFrame:
    """(doc_id, cluster_rep) for EVERY document — singletons represent
    themselves; near-dup clusters collapse to their smallest id. The
    keep-set of a corpus dedup is then ``WHERE doc_id = cluster_rep``
    (exactly one survivor per cluster, regardless of how the pair list
    chained)."""
    labels = connected_components(
        docs.select(id_col), pairs, id_col=id_col, src_col="id_a", dst_col="id_b",
        algorithm=algorithm,
    )
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_rep"))
