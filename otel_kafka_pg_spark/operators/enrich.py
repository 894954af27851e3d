"""Lookup enrich — broadcast hash join on (tool, role).

The reference enriches every record with resource attributes during decode
(an in-memory map merge per row, reference: processor.go:116-119 traces,
:213-218 logs) and extracts ``service.name`` with an "unknown" default
(processor.go:94-103). The Spark-native shape of a small-dimension enrich is
an explicit broadcast hash join: the lookup is ≤100 rows, so every executor
gets a copy and the join never shuffles the fact side — verified in tests by
asserting BroadcastHashJoin in the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_lookup(df: DataFrame, lookup: DataFrame) -> DataFrame:
    """Left-join the (tool, role) lookup; misses → service 'unknown', empty attrs."""
    lk = lookup.select(
        F.col("tool").alias("_lk_tool"),
        F.col("role").alias("_lk_role"),
        "service_name",
        # parse the attr JSON here, on the ≤100-row side, BEFORE broadcast —
        # the fact-side hot path then merges ready-made maps instead of
        # running from_json per row
        F.from_json(F.col("resource_attrs"), "map<string,string>").alias("resource_attrs"),
    )
    joined = df.join(
        F.broadcast(lk),
        (df["tool"] == lk["_lk_tool"]) & (df["role"] == lk["_lk_role"]),
        "left",
    ).drop("_lk_tool", "_lk_role")
    empty_map = F.from_json(F.lit("{}"), "map<string,string>")
    return joined.withColumns(
        {
            "service_name": F.coalesce(F.col("service_name"), F.lit("unknown")),
            "resource_attrs": F.coalesce(F.col("resource_attrs"), empty_map),
        }
    )
