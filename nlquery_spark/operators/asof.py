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
    ``on`` key (null when no such row exists).

    The right payload is carried as ONE struct (not per-column fills):
    per-column ``last(ignorenulls)`` would tear values from different
    right rows when payload columns are themselves nullable. Right rows
    with a null ``right_time`` are meaningless for as-of ordering and
    are dropped.

    Payload names must not collide with left columns — a silent duplicate
    output column would only surface as an AnalysisException on the first
    downstream reference, so collisions are rejected here."""
    left_cols = left.columns
    payload = [c for c in right_cols if c != on]
    clash = sorted(set(payload) & set(left_cols))
    if clash:
        raise ValueError(
            f"asof_join right payload column(s) {clash} collide with left "
            "columns; alias the right side before joining"
        )
    r_struct_t = F.struct(*[F.col(c).alias(c) for c in payload])
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload)
            + ">"
        )
        .alias("_r"),
    )
    r_tag = right.filter(F.col(right_time).isNotNull()).select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left_cols],
        r_struct_t.alias("_r"),
    )
    # right rows sort BEFORE left rows at equal time -> <= semantics
    w = Window.partitionBy("_k").orderBy("_t", "_side").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    filled = l_tag.unionByName(r_tag).select(
        "*", F.last(F.col("_r"), ignorenulls=True).over(w).alias("_f")
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        *[F.col("_f").getField(c).alias(c) for c in payload],
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
    # fully-qualified residual so shared column names between the two
    # sides never bind ambiguously
    cond = (
        (p[on] == iv[on])
        & (p["_bucket"] == iv["_bucket"])
        & (p[point_time] >= iv[start_col])
        & (p[point_time] <= iv[end_col])
    )
    out_cols = [p[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c != on and c not in points.columns
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
    # null timestamps cannot be bucketed: excluded on both engine sides
    # (a NULL bucket is otherwise ambiguous with the grouping-set NULL
    # marker and would emit one duplicate row per grain)
    base = df.filter(F.col(time_col).isNotNull()).select(
        F.col(value_col).alias("_v"),
        *[
            F.date_format(
                F.date_trunc(g, F.col(time_col)), "yyyy-MM-dd HH:mm:ss"
            ).alias(f"b_{g}")
            for g in grains
        ],
    )
    # DataFrame-native grouping sets (no temp-view round trip): with
    # null inputs excluded, a NULL bucket column identifies "not this
    # grouping set" unambiguously
    grouped = base.groupingSets(
        [[F.col(f"b_{g}")] for g in grains],
        *[F.col(f"b_{g}") for g in grains],
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("_v").cast("decimal(10,2)")).cast("double").alias("sum_value"),
    )
    grain = F.lit(None).cast("string")
    for g in reversed(grains):
        grain = F.when(F.col(f"b_{g}").isNotNull(), F.lit(g)).otherwise(grain)
    return grouped.select(
        grain.alias("grain"),
        F.coalesce(*[F.col(f"b_{g}") for g in grains]).alias("bucket_ts"),
        "n_events",
        "sum_value",
    )
