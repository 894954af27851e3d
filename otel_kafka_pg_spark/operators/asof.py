"""As-of (time-travel) join — an extension operator Spark lacks natively.

Not present in the reference (its only joins are two Postgres-view left
equi-joins, SURVEY §2.4); provided because telemetry/training pipelines
constantly need "attach the most recent dimension state as of this event's
timestamp".

Formulation is the scalable sort-merge shape, NOT a theta-join:

    union(left tagged 1, right tagged 0)
      → window per key ORDER BY (ts, tag): last(value, ignoreNulls)
      → keep left rows

One shuffle on the key (same partitioning a plain join would need), no
key × key row explosion, no range-condition nested loop. At 10^12 rows the
cost is exactly one sort-within-partitions of left+right — the same as any
windowed operator — versus a BroadcastNestedLoop/cartesian a naive
``l.ts >= r.ts`` join degenerates to. Right side must be unique per
(key, ts); pre-aggregate if not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    value_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """For each left row, attach the latest right values with
    right_ts <= left_ts (inclusive, matching DuckDB/pandas ASOF backward
    semantics) for the same ``on`` key; nulls when no prior right row.

    Precondition: ``value_cols`` must be disjoint from the left frame's
    columns — otherwise the union would select the column twice and the
    left copies would pollute the last(ignorenulls) fill. Rename left-side
    collisions before calling."""
    lcols = left.columns
    clash = set(value_cols) & set(lcols)
    if clash:
        raise ValueError(
            f"value_cols {sorted(clash)} already exist on the left frame; "
            "rename them before asof_join (they would shadow the as-of fill)"
        )
    l = left.withColumn("_tag", F.lit(1)).withColumn("_ats", F.col(left_ts))
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ats"),
        *[F.col(c) for c in value_cols],
    ).withColumn("_tag", F.lit(0))
    for c in lcols:
        if c not in (on,) and c not in r.columns:
            r = r.withColumn(c, F.lit(None))
    for c in value_cols:
        if c not in l.columns:
            l = l.withColumn(c, F.lit(None))
    unioned = l.select(on, "_ats", "_tag", *[c for c in lcols if c != on], *value_cols).unionByName(
        r.select(on, "_ats", "_tag", *[c for c in lcols if c != on], *value_cols)
    )
    # right rows (_tag 0) sort before left rows at equal ts → inclusive <=
    w = Window.partitionBy(on).orderBy("_ats", "_tag").rowsBetween(Window.unboundedPreceding, 0)
    filled = unioned.select(
        on,
        "_ats",
        "_tag",
        *[c for c in lcols if c != on],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.filter(F.col("_tag") == 1).select(*lcols, *value_cols)
