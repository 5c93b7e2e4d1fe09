"""Event-stream product analytics: funnels, transition matrices,
volume anomalies.

The operators a training-data/metrics pipeline runs over its event or
telemetry tables next to the corpus ops (reference analog: none —
nlquery is a query-parsing library with no event layer; this module is
mission-added Spark-native design, same status as operators/graph.py).
All three are pure DataFrame compositions — no UDFs, no driver-side
loops — and every score is either an integer count or a plain IEEE
ratio ROUNDed to 6, so each has an exact ANSI-SQL oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def funnel_stages(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: for each step i, how many users reached
    it via a STRICTLY time-ordered chain step_1 < step_2 < ... < step_i
    (first qualifying occurrence each time), plus step-over-step
    conversion. Output: (stage, event_type, users, conversion) with
    stage 1-based and conversion = users_i / users_{i-1} (1.0 at stage
    1), ROUNDed to 6.

    ``within_seconds`` optionally bounds each hop: step i+1 must occur
    within that many seconds of the step-i timestamp (the "converted
    within an hour" product question). None = unbounded.

    Plan — ONE event-table scan: the source is prefiltered to the
    funnel's step types, projected to (user, ts, type), and eagerly
    localCheckpointed; every stage reads that checkpoint (without it,
    Catalyst replays the source lineage for EACH consumer — stage i
    feeds both its count and stage i+1, so a k-stage funnel re-scanned
    the events k(k+1)/2 times, plan-verified). Stage i is then a
    user-keyed min-timestamp aggregation of step-i rows JOINED to the
    checkpointed stage-(i-1) reach set — each join is on the user key,
    and the reach set only shrinks, so AQE broadcasts it as soon as it
    fits. The per-stage user COUNTS are 1-row aggregates unioned
    JVM-side with conversion from a lag window over the k-row frame —
    no driver-side .collect() anywhere, so the funnel composes into
    larger plans and the counts stay in the JVM. An EMPTY intermediate
    stage yields NULL conversion for the next stage (never a
    divide-by-zero error or NaN — ANSI division would abort the job,
    and NaN diverges from SQL engines' NULL).
    """
    steps = list(steps)
    if not steps:
        raise ValueError("funnel_stages needs at least one step")
    base = (
        events.filter(F.col(type_col).isin(steps))
        .select(
            F.col(user_col).alias("user"),
            F.col(ts_col).alias("ts"),
            F.col(type_col).alias("step"),
        )
        .localCheckpoint(eager=True)
    )
    reach = (
        base.filter(F.col("step") == steps[0])
        .groupBy("user")
        .agg(F.min("ts").alias("t"))
        .localCheckpoint(eager=True)
    )
    counts = reach.agg(F.count(F.lit(1)).alias("users")).select(
        F.lit(1).alias("stage"), F.lit(steps[0]).alias("event_type"), "users"
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = base.filter(F.col("step") == step).select(
            "user", F.col("ts").alias("ts_i")
        )
        cond = F.col("ts_i") > F.col("t")
        if within_seconds is not None:
            cond = cond & (
                F.col("ts_i")
                <= F.col("t") + F.expr(f"INTERVAL {int(within_seconds)} SECOND")
            )
        reach = (
            nxt.join(reach, "user")
            .filter(cond)
            .groupBy("user")
            .agg(F.min("ts_i").alias("t"))
            .localCheckpoint(eager=True)
        )
        counts = counts.unionAll(
            reach.agg(F.count(F.lit(1)).alias("users")).select(
                F.lit(i).alias("stage"), F.lit(step).alias("event_type"), "users"
            )
        )
    w = Window.orderBy("stage")
    prev = F.lag("users").over(w)
    return counts.select(
        "stage",
        "event_type",
        F.col("users").cast("long").alias("users"),
        F.when(prev.isNull(), F.lit(1.0))
        .when(prev == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.col("users") / prev.cast("double"), 6))
        .alias("conversion"),
    )


def type_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: (src, dst, n, prob) where n counts consecutive
    (src -> dst) pairs in each user's timeline and prob is the
    row-normalized transition probability (pure ratio, ROUND 6).

    ``order_cols`` break timestamp ties deterministically (event id by
    default) — without a total order the lead() below is
    partition-order dependent and the result non-reproducible.

    Plan: ONE user-keyed exchange for the sequence window (lead over
    (ts, *order_cols) within user), then a (src, dst)-keyed count agg —
    5x5-ish output for a bounded event-type vocabulary. Row totals come
    from a window over the tiny transition matrix itself, not a second
    pass over the events.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    pairs = (
        events.withColumn("dst", F.lead(type_col).over(w))
        .filter(F.col("dst").isNotNull())
        .groupBy(F.col(type_col).alias("src"), "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("src")
    return pairs.select(
        "src",
        "dst",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.sum("n").over(wt).cast("double"), 6).alias(
            "prob"
        ),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention-cohort matrix: users are cohorted by the week
    of their FIRST event, and each (cohort_week, activity_week) cell
    counts the cohort's users active that week plus the retention
    ratio vs the cohort's own week-0 size. Output: (cohort_week,
    activity_week, users, retention) with DATE week columns
    (date_trunc week = ISO Monday in both Spark and ANSI engines) and
    retention ROUNDed to 6.

    Plan: one scan feeds both user-keyed aggregates — first-week per
    user (min) and the distinct (user, week) activity set; the join
    back is user-keyed and the final cell aggregation is
    (cohort, week)-keyed. Cohort sizes come from a window over the
    cells matrix itself (cohorts x weeks — tiny), not a second pass.
    """
    week = F.date_trunc("week", F.col(ts_col))
    fw = events.groupBy(user_col).agg(F.min(week).alias("cohort_w"))
    act = events.select(user_col, week.alias("activity_w")).distinct()
    cells = (
        act.join(fw, user_col)
        .groupBy("cohort_w", "activity_w")
        .agg(F.count_distinct(user_col).alias("users"))
    )
    w0 = Window.partitionBy("cohort_w")
    size = F.max(
        F.when(F.col("activity_w") == F.col("cohort_w"), F.col("users"))
    ).over(w0)
    return cells.select(
        F.col("cohort_w").cast("date").alias("cohort_week"),
        F.col("activity_w").cast("date").alias("activity_week"),
        F.col("users").cast("long").alias("users"),
        F.round(F.col("users") / size.cast("double"), 6).alias("retention"),
    )


def daily_volume_zscore(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-(event_type, day) volume with a z-score against that type's
    own daily history: (event_type, day, n, zscore). The basic volume
    anomaly detector — |z| >= 3 flags a day whose event count departs
    from the type's mean by 3 sample standard deviations.

    z = (n - avg_type(n)) / stddev_samp_type(n), ROUND 6; types with a
    single day (stddev NULL) or constant volume (stddev 0) emit NULL —
    explicitly, rather than Inf/NaN, since NaN ordering differs across
    engines.

    Plan: one (type, day)-keyed count agg over the events (map-side
    combine does the heavy lifting — days x types is tiny), then the
    mean/stddev window over that tiny aggregate. The raw event stream
    is touched exactly once.
    """
    day = F.to_date(F.col(ts_col)).alias("day")
    counts = events.groupBy(F.col(type_col).alias("event_type"), day).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type")
    sd = F.stddev_samp(F.col("n").cast("double")).over(w)
    mu = F.avg(F.col("n").cast("double")).over(w)
    z = F.when(
        sd.isNull() | (sd == 0), F.lit(None).cast("double")
    ).otherwise(F.round((F.col("n") - mu) / sd, 6))
    return counts.select(
        "event_type",
        "day",
        F.col("n").cast("long").alias("n"),
        z.alias("zscore"),
    )
