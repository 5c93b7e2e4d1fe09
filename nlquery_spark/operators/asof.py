"""As-of join: each left row matched to the latest right row at or
before its timestamp, per key — the canonical example of an operator
Spark's SQL surface lacks, composed from built-ins instead of dropping
to Python.

Composition (the "union trick"): tag both sides, union them, sort each
key's partition once by (time, side), and carry the right-side payload
forward with ``last(..., ignorenulls=True)`` over an unbounded-preceding
window; left rows then read their as-of match from the filled columns.

Scale posture: ONE shuffle on the key (the union sorts within the
window's partitions) versus the naive range-join formulation, which
Spark plans as a broadcast nested loop or a cartesian-with-filter. Skew
on hot keys is the same exposure as any keyed window (salt upstream if
one key dominates). Ties: a right row exactly at the left row's time IS
matched (<=); multiple right rows with identical (key, time) are not
ordered — pre-dedupe the right side per (key, time) for deterministic
output (the driver query does).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: Sequence[str],
) -> DataFrame:
    """Left as-of join: all left columns plus ``right_cols`` from the
    latest right row with ``right_time <= left_time`` for the same
    ``on`` key (null when no such row exists)."""
    left_cols = left.columns
    payload = [c for c in right_cols if c != on]
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload],
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left_cols],
        *[F.col(c).alias(f"_r_{c}") for c in payload],
    )
    # right rows sort BEFORE left rows at equal time -> <= semantics
    w = Window.partitionBy("_k").orderBy("_t", "_side").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    filled = l_tag.unionByName(r_tag).select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in payload
        ],
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        *[F.col(f"_f_{c}").alias(c) for c in payload],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_time: str,
    start_col: str,
    end_col: str,
    bucket: str = "1 day",
) -> DataFrame:
    """Points-in-intervals join: every (point, interval) pair with the
    same key and ``start <= t <= end`` — the second classic operator
    Spark's planner lacks a fast path for (a naive range predicate
    becomes a broadcast nested loop or cartesian+filter).

    Composition: intervals explode into every time bucket they span,
    points map to their single bucket, and the pair condition becomes an
    EQUI-join on (key, bucket) plus an exact residual filter. A point's
    bucket intersects a qualifying interval's bucket set exactly once,
    so no dedup is needed. Choose ``bucket`` close to the typical
    interval length: the explode factor is ~interval_len/bucket and the
    false-candidate rate ~bucket/interval_len.
    """
    dur = F.expr(f"INTERVAL {bucket}")
    p_epoch = F.col(point_time).cast("timestamp_ltz").cast("long")
    s_epoch = F.col(start_col).cast("timestamp_ltz").cast("long")
    e_epoch = F.col(end_col).cast("timestamp_ltz").cast("long")
    # bucket width in seconds: computed as a DIFFERENCE so the session
    # timezone cancels (evaluated once, driver-side)
    ts0 = F.lit("2000-01-01 00:00:00").cast("timestamp_ltz")
    width = (
        points.sparkSession.range(1)
        .select((ts0 + dur).cast("long") - ts0.cast("long"))
        .first()[0]
    )
    p = points.withColumn("_bucket", F.floor(p_epoch / width))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(s_epoch / width), F.floor(e_epoch / width))),
    )
    cond = (
        (p[on] == iv[on])
        & (p["_bucket"] == iv["_bucket"])
        & (F.col(point_time) >= F.col(start_col))
        & (F.col(point_time) <= F.col(end_col))
    )
    out_cols = [p[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c != on
    ]
    return p.join(iv, cond).select(*out_cols)


def time_rollup(
    df: DataFrame,
    time_col: str,
    value_col: str,
    grains: Sequence[str] = ("minute", "hour", "day"),
) -> DataFrame:
    """Hypertable-style continuous aggregate: multi-resolution time
    rollups (count + sum per minute/hour/day bucket) computed in ONE
    scan via GROUPING SETS — the batch analog of TimescaleDB continuous
    aggregates. Each output row carries its grain, the bucket timestamp
    (canonical string — engine-portable), and the aggregates; a
    downstream dashboard reads whichever resolution it needs without
    re-scanning raw data. One shuffle total (grouping sets share it);
    at scale, write the result partitioned by grain so readers prune.
    """
    spark = df.sparkSession
    view = f"_rollup_{abs(hash((time_col, value_col, tuple(grains)))) % 10**8}"
    df.createOrReplaceTempView(view)
    cols = ", ".join(
        f"date_format(date_trunc('{g}', {time_col}), 'yyyy-MM-dd HH:mm:ss') AS b_{g}"
        for g in grains
    )
    sets = ", ".join(f"(b_{g})" for g in grains)
    grain_expr = "CASE " + " ".join(
        f"WHEN b_{g} IS NOT NULL THEN '{g}'" for g in grains
    ) + " END"
    bucket_expr = "COALESCE(" + ", ".join(f"b_{g}" for g in grains) + ")"
    out = spark.sql(f"""
        SELECT {grain_expr} AS grain, {bucket_expr} AS bucket_ts,
               COUNT(*) AS n_events,
               CAST(SUM(CAST({value_col} AS DECIMAL(10,2))) AS DOUBLE) AS sum_value
        FROM (SELECT {time_col}, {value_col}, {cols} FROM {view})
        GROUP BY GROUPING SETS ({sets})
    """)
    return out
