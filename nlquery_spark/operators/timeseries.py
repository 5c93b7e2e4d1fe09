"""Time-series regularization: resample to a fixed grid + gap-fill.

The events/metrics side of a web-scale pipeline (crawl rates, mention
rates, per-entity activity) needs regular time grids for dashboards and
models; raw event streams have gaps. ``resample_locf`` materializes a
per-key time spine and carries the last observation forward — the
classic LOCF resample, built from pure DataFrame ops:

    spine  = explode(sequence(trunc(min ts), trunc(max ts), step))
    last   = row_number window per (key, bucket), newest first
    filled = last(value, ignorenulls=True) over an ordered window

Scale: the spine join and the fill window shuffle on the KEY — state
per task is one key's buckets (bounded by the key's time span / step),
so skew follows key activity spans, not event counts; the per-bucket
last-observation window partitions by (key, bucket), finer still. No
UDFs, no driver loops; the sequence() explode generates the spine
distributed, never on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def resample_locf(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    order_col: str = "event_id",
    unit: str = "hour",
) -> DataFrame:
    """(key, bucket, value_locf, n_obs) on a regular ``unit`` grid per
    key, from the key's first to last observation; empty buckets carry
    the previous bucket's last value forward. Within a bucket the
    surviving value is the LAST observation by (ts, order_col) — the
    deterministic tie-break any engine can reproduce. The first bucket
    always contains an observation (the spine starts at trunc(min ts)),
    so value_locf is never null."""
    step = {"hour": "interval 1 hour", "day": "interval 1 day", "minute": "interval 1 minute"}[unit]
    e = events.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).cast("timestamp_ltz").alias("ts"),
        F.col(val_col).alias("val"),
        F.col(order_col).alias("ord"),
    )
    bounds = e.groupBy("key").agg(
        F.date_trunc(unit, F.min("ts")).alias("mn"),
        F.date_trunc(unit, F.max("ts")).alias("mx"),
    )
    spine = bounds.select(
        "key", F.explode(F.sequence("mn", "mx", F.expr(step))).alias("bucket")
    )
    obs = e.withColumn("bucket", F.date_trunc(unit, F.col("ts")))
    w_last = Window.partitionBy("key", "bucket").orderBy(
        F.desc("ts"), F.desc("ord")
    )
    last_obs = (
        obs.withColumn("_rn", F.row_number().over(w_last))
        .filter(F.col("_rn") == 1)
        .select("key", "bucket", F.col("val").alias("_obs"))
    )
    counts = obs.groupBy("key", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs")
    )
    w_fill = Window.partitionBy("key").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        spine.join(last_obs, ["key", "bucket"], "left")
        .join(counts, ["key", "bucket"], "left")
        .select(
            F.col("key").alias(key_col),
            "bucket",
            F.last("_obs", ignorenulls=True).over(w_fill).alias("value_locf"),
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
        )
    )
