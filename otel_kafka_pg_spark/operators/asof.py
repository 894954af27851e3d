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
    columns — otherwise the output column would be ambiguous. The internal
    marker names ``_tag``/``_ats``/``_rrow`` are likewise reserved (a left
    column of that name would be silently overwritten). Rename collisions
    before calling.

    NULL semantics match DuckDB ASOF / pandas merge_asof exactly: the fill
    carries the matched right ROW as one struct (``last(struct,
    ignorenulls)``), so a right row whose VALUE is NULL still wins the
    match and fills NULL (a per-column ignorenulls fill would return a
    stale older value, and could tear columns from different right rows);
    right rows with a NULL timestamp are excluded up front (``l.ts >=
    NULL`` is never true)."""
    lcols = left.columns
    clash = (set(value_cols) | {"_tag", "_ats", "_rrow"}) & set(lcols)
    if clash:
        raise ValueError(
            f"columns {sorted(clash)} on the left frame collide with asof_join's "
            "output value_cols or internal markers; rename them before the join"
        )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_tag"),
        *[c for c in lcols if c != on],
        *[F.lit(None).alias(c) for c in value_cols],
    )
    r = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(on),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).alias(c) for c in lcols if c != on],
        *[F.col(c) for c in value_cols],
    )
    unioned = l.unionByName(r).withColumn(
        "_rrow", F.when(F.col("_tag") == 0, F.struct(*value_cols))
    )
    # right rows (_tag 0) sort before left rows at equal ts → inclusive <=
    w = Window.partitionBy(on).orderBy("_ats", "_tag").rowsBetween(Window.unboundedPreceding, 0)
    filled = unioned.select(
        "_tag",
        *[c for c in lcols],
        F.last("_rrow", ignorenulls=True).over(w).alias("_rrow"),
    )
    return filled.filter(F.col("_tag") == 1).select(
        *lcols, *[F.col(f"_rrow.{c}").alias(c) for c in value_cols]
    )
