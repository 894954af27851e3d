"""Behavioral analytics over event streams: funnels, cohorts, entry paths.

The reference's read side answers "what happened per service over time"
(modules/log/repository/repository.go:117-214 count/group endpoints); a
log pipeline at corpus scale additionally answers "what did each USER do
over time" — ordered funnels, cohort retention, and common entry paths.
These are the standard session/journey queries every event-log warehouse
runs, expressed shuffle-minimally:

- ``funnel_conversion``: per-user first-arrival-time chain. All N step
  times are entire-partition window mins over the SAME
  ``partitionBy(user)`` spec, so the plan carries exactly ONE hash
  exchange of the raw events; the cascade (step i counts only events
  strictly after the user's step-(i-1) time) is row-level comparison
  against the per-user scalar the previous Window node produced — no
  self-joins, no N passes over the fact table. The per-user reduction
  that follows reuses the window's partitioning (no second raw-event
  shuffle), and everything after it is a handful of rows.
- ``cohort_retention``: cohort = day of a user's first event; activity
  offset in whole weeks. One groupBy(user) for the cohort dim, one
  hash join back on the same key (AQE reuses the partitioning), one
  count-distinct agg keyed by (cohort_day, week_offset) — a key space
  bounded by days×weeks, never by users.
- ``entry_paths``: the first k events per user concatenated into a path
  string, counted, top-n by (count desc, path asc). One window shuffle
  on user, then TakeOrdered — no global sort.

At 100 TB the only large shuffle any of these performs is the single
hash partition of events by user_id; user activity skew is bounded (a
user's event count is human-scale), and every later stage operates on
per-user or per-cohort rows that are orders of magnitude smaller.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: step i is reached by users whose earliest step-i
    event is STRICTLY after their earliest qualifying step-(i-1) event.

    Returns one row per step: (step_idx, step, users, conversion) where
    conversion = users / users-at-step-1 (the single IEEE division; every
    other value is an exact integer both engines reproduce).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user_col)
    df = events
    prev: str | None = None
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            # strict ordering: a click at the exact signup timestamp does
            # NOT advance the funnel (ts > t_prev, never >=)
            cond = cond & (F.col(ts_col) > F.col(prev))
        name = f"_t{i}"
        df = df.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = name
    # _ti is constant per user; reduce to one row per user (reuses the
    # window's hashpartitioning — no new raw-event shuffle), then count.
    per_user = df.groupBy(user_col).agg(*[F.max(f"_t{i}").alias(f"_t{i}") for i in range(len(steps))])
    totals = per_user.agg(
        *[
            # coalesce: an EMPTY events frame must yield 0, not NULL, to
            # agree with the oracle's count(*) (empty inputs are routine)
            F.coalesce(F.sum(F.when(F.col(f"_t{i}").isNotNull(), 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(f"_u{i}")
            for i in range(len(steps))
        ]
    )
    # build the per-step rows with typed literals (NOT an interpolated
    # stack() SQL string — a step name containing a quote must not parse
    # or inject into the expression)
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(f"_u{i}").alias("users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    stacked = totals.select(F.explode(rows).alias("r"), F.col("_u0").alias("_base"))
    return stacked.select(
        "r.step_idx",
        "r.step",
        "r.users",
        # try_divide: a corpus slice with zero step-1 users yields NULL
        # (the oracle's 0/0 result), never an ANSI DIVIDE_BY_ZERO crash
        F.try_divide(F.col("r.users").cast("double"), F.col("_base")).alias("conversion"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort × week-offset retention grid.

    cohort_day = date_trunc('day', user's first event); week_offset =
    floor(days-since-cohort / 7); active_users = distinct users of that
    cohort active in that week. All integers / timestamps — exact.
    """
    first = events.groupBy(user_col).agg(F.date_trunc("day", F.min(ts_col)).alias("cohort_day"))
    joined = events.select(user_col, ts_col).join(first, user_col)
    week = F.floor(F.datediff(F.to_date(ts_col), F.to_date("cohort_day")) / F.lit(7)).alias("week_offset")
    return (
        joined.groupBy("cohort_day", week)
        .agg(F.count_distinct(F.col(user_col)).alias("active_users"))
    )


def entry_paths(
    events: DataFrame,
    k: int = 3,
    top_n: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Most common entry journeys: the first ``k`` event types per user
    (ts then tiebreak order), joined with '>', counted, top-``top_n`` by
    (n_users DESC, path ASC) — a deterministic total order so the cut is
    engine-stable. Users with fewer than ``k`` events contribute their
    full (shorter) path.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    firsts = (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(user_col)
        # sorting the (rn, type) structs then projecting the type gives an
        # order-insensitive exact aggregate (collect_list alone has no
        # ordering guarantee across tasks)
        .agg(F.array_sort(F.collect_list(F.struct(F.col("_rn"), F.col(type_col).alias("t")))).alias("seq"))
        .select(F.array_join(F.transform("seq", lambda s: s["t"]), ">").alias("path"))
    )
    return (
        firsts.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(top_n)
    )


def event_type_affinity(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Market-basket affinity: for each unordered pair of event types,
    how many users performed BOTH. Distinct (user, type) first — the
    self-join then runs over at most |users| x |types| rows (never raw
    events), co-partitioned on user so the join is exchange-cheap; the
    pair key space is |types| choose 2, so the final agg is tiny."""
    ut = events.select(user_col, type_col).distinct()
    a = ut.withColumnRenamed(type_col, "type_a")
    b = ut.withColumnRenamed(type_col, "type_b")
    pairs = a.join(b, user_col).filter(F.col("type_a") < F.col("type_b"))
    return pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


def engagement_histogram(
    events: DataFrame,
    user_col: str = "user_id",
) -> DataFrame:
    """Engagement distribution: how many users produced exactly N events.
    Two keyed aggregations (user -> count, count -> users); the second
    operates on one row per user. The standard data-card 'activity
    histogram' a corpus over user-generated turns reports."""
    per_user = events.groupBy(user_col).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    return per_user.groupBy("n_events").agg(F.count(F.lit(1)).cast("long").alias("n_users"))


def rolling_active_users(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Trailing-window active users (the WAU curve): for each day, the
    distinct users active in the preceding ``window_days`` days
    (inclusive). Sliding-window COUNT DISTINCT does not decompose, so
    the scale-sane exact form is contribution fan-out: each distinct
    (user, activity-day) row explodes into the ``window_days`` report
    days it contributes to — a bounded x7 blow-up of the already-distinct
    per-day frame, NOT a per-day rescan of raw events (365 rescans/year)
    and NOT a global sort. Report days trail past the last activity day
    by up to window_days-1 (a user active on the final day is still
    'active this week' for the next 6 report days)."""
    day = F.date_trunc("day", F.col(ts_col))
    ud = events.select(F.col(user_col).alias("u"), day.alias("aday")).distinct()
    days = F.explode(
        F.sequence(
            F.col("aday"),
            F.col("aday") + F.expr(f"INTERVAL {window_days - 1} DAYS"),
            F.expr("INTERVAL 1 DAY"),
        )
    ).alias("report_day")
    return (
        ud.select("u", days)
        .groupBy("report_day")
        .agg(F.count_distinct("u").alias("active_users"))
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts: for each (from_type, to_type),
    how many times a user's event of from_type was IMMEDIATELY followed by
    to_type (per-user (ts, tiebreak) order). One window shuffle on user;
    the transition agg's key space is |types|^2. The journey-analytics
    complement to entry_paths: all transitions, not just the first k."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    return (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )


def hot_keys(
    events: DataFrame,
    key_col: str = "user_id",
    top_n: int = 10,
    per_mille_threshold: int = 20,
) -> DataFrame:
    """Skew diagnostic: the top-N heaviest keys with their row share and an
    integer-exact 'hot' flag (n*1000 >= threshold*total) — the report you
    run BEFORE keying a 100 TB join, to decide whether salting / AQE skew
    handling is needed. One keyed count; the total is re-aggregated from
    the counts frame (never a second fact scan, the hh1 discipline) and
    broadcast; top-N is TakeOrdered by (n DESC, key ASC)."""
    counts = events.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    total = counts.agg(F.sum("n").cast("long").alias("total_rows"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("n").cast("double") / F.col("total_rows"))
        .withColumn(
            "hot",
            F.when(F.col("n") * 1000 >= per_mille_threshold * F.col("total_rows"), 1)
            .otherwise(0)
            .cast("long"),
        )
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(top_n)
    )


def ab_arm_conversion(
    events: DataFrame,
    convert_type: str = "purchase",
    enter_type: str = "signup",
    n_arms: int = 2,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Experiment-analytics readout: assign every user to an arm by a
    PORTABLE deterministic hash (md5 of the id string, 60-bit, mod
    n_arms — the sp1 split discipline: RNG-free, any engine re-derives
    the same assignment), then report per-arm entered / converted user
    counts and the conversion rate (one IEEE division; counts exact).
    One groupBy(user) over events, then an |arms|-row aggregate."""
    from ..functions.text import md5_60bit

    arm = F.pmod(md5_60bit(F.col(user_col).cast("string")), F.lit(n_arms)).alias("arm")
    per_user = events.groupBy(user_col).agg(
        F.max(F.when(F.col(type_col) == enter_type, 1).otherwise(0)).alias("_entered"),
        F.max(F.when(F.col(type_col) == convert_type, 1).otherwise(0)).alias("_converted"),
    )
    return (
        per_user.select(arm, "_entered", "_converted")
        .groupBy("arm")
        .agg(
            F.sum("_entered").cast("long").alias("entered"),
            # converted counts only users who ALSO entered (intent-to-treat)
            F.sum(F.col("_entered") * F.col("_converted")).cast("long").alias("converted"),
        )
        # try_divide: an arm with zero entered users reads NULL (the
        # oracle's x/0 result), never an ANSI DIVIDE_BY_ZERO crash
        .withColumn("conversion", F.try_divide(F.col("converted").cast("double"), F.col("entered")))
    )


def conversion_time_percentiles(
    events: DataFrame,
    start_type: str = "signup",
    end_type: str = "purchase",
    quantiles: Sequence[int] = (50, 90),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-to-convert distribution: per converting user, the whole-second
    delta from first start_type event to the first end_type event strictly
    after it; reported as DISCRETE percentiles (the value at rank
    ceil(q/100 * n) in ascending order — an actual observed integer, no
    interpolation, so both engines agree bit-for-bit).

    The per-user deltas frame has one row per converting user; the exact
    percentile needs a total order over it. That is the known cost of
    EXACT percentiles (same stance as a7): the global sort runs over the
    small per-user frame, never raw events, and the production path at
    10^9-user scale is the approx-sketch twin (cd1's discipline)."""
    w = Window.partitionBy(user_col)
    t1 = F.min(F.when(F.col(type_col) == start_type, F.col(ts_col))).over(w)
    df = events.withColumn("_t1", t1)
    t2 = F.min(
        F.when((F.col(type_col) == end_type) & (F.col(ts_col) > F.col("_t1")), F.col(ts_col))
    ).over(w)
    per_user = (
        df.withColumn("_t2", t2)
        .groupBy(user_col)
        .agg(F.max("_t1").alias("t1"), F.max("_t2").alias("t2"))
        .filter(F.col("t2").isNotNull())
        .select(
            (F.col("t2").cast("timestamp").cast("long") - F.col("t1").cast("timestamp").cast("long")).alias(
                "delta_s"
            )
        )
    )
    n = per_user.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranked = per_user.crossJoin(F.broadcast(n)).select(
        "delta_s", "n", F.row_number().over(Window.orderBy("delta_s")).alias("rk")
    )
    qs = ", ".join(str(q) for q in quantiles)
    picked = ranked.filter(
        F.expr(f"exists(array({qs}), q -> rk = CAST(ceil(q / 100.0 * n) AS BIGINT))")
    )
    return picked.select(
        F.explode(
            F.filter(
                F.expr(f"array({qs})"),
                lambda q: F.col("rk") == F.ceil(q / F.lit(100.0) * F.col("n")).cast("long"),
            )
        ).alias("pct"),
        F.col("delta_s").alias("seconds"),
    )


def rfm_features(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user RFM feature vector (recency / frequency / monetary) — the
    classic churn-model feature build. One keyed aggregation; the corpus
    anchor date is the table's max ts, re-aggregated from the per-user
    frame and broadcast (one row — never a second fact scan). Monetary is
    summed in integer CENTS (round(value*100)): double summation is
    order-sensitive across engines, integer summation is exact."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    per_user = events.groupBy(user_col).agg(
        F.max(ts_col).alias("last_ts"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(cents).cast("long").alias("monetary_cents"),
    )
    anchor = per_user.agg(F.max("last_ts").alias("_anchor"))
    return (
        per_user.crossJoin(F.broadcast(anchor))
        .select(
            user_col,
            F.datediff(F.to_date("_anchor"), F.to_date("last_ts"))
            .cast("long")
            .alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )


def calendar_profile(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Weekday × hour activity grid (the calendar-heatmap feed, and the
    seasonality profile batch schedulers consult). ISO weekday (1=Monday
    .. 7=Sunday) — the one day-numbering both engines can derive exactly
    (Spark weekday()+1 == DuckDB isodow). Single keyed aggregation over a
    7x24 key space."""
    return (
        events.groupBy(
            (F.weekday(F.col(ts_col)) + F.lit(1)).cast("long").alias("isodow"),
            F.hour(F.col(ts_col)).cast("long").alias("hour"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
