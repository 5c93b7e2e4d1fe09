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


def ewma_weights(alpha: float, k: int) -> list:
    """The shared weight table for :func:`ewma`: ``(1-alpha)**j`` for
    j = 0..k-1, computed ONCE in Python and embedded as literals on
    both engines (the Spark expression and the SQL oracle interpolate
    ``repr()`` of these exact doubles), so no cross-engine ``pow()``
    ulp divergence can enter the score."""
    return [(1.0 - alpha) ** j for j in range(k)]


def ewma(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    order_col: str = "event_id",
    alpha: float = 0.3,
    k: int = 5,
) -> DataFrame:
    """Per-key exponentially-weighted moving average over the last
    ``k`` observations (finite, normalized form):

        ewma_t = sum_j w_j * x_{t-j} / sum_j w_j,  w_j = (1-alpha)^j

    summed over the j in 0..k-1 that exist (the first rows of a key
    average over fewer points instead of decaying toward an arbitrary
    seed). The infinite-recurrence EWMA is inherently sequential; the
    k-term window form is the distributed-friendly equivalent (a
    k-lag window over the key partition — one shuffle on the key,
    no iteration) and is what monitoring pipelines actually use for
    "smoothed rate over recent events".

    Determinism/oracle contract: observation order is (ts, order_col)
    — a total order; terms are summed in FIXED ascending-j order with
    the weights from :func:`ewma_weights` embedded as exact double
    literals, so an ANSI-SQL oracle that writes the same expression
    reproduces the value bit-for-bit before ROUND(.., 6).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    weights = ewma_weights(alpha, k)
    num = None
    den = None
    for j, wj in enumerate(weights):
        x = F.col(val_col) if j == 0 else F.lag(val_col, j).over(w)
        term_n = F.when(x.isNotNull(), x * F.lit(wj)).otherwise(F.lit(0.0))
        term_d = F.when(x.isNotNull(), F.lit(wj)).otherwise(F.lit(0.0))
        num = term_n if num is None else num + term_n
        den = term_d if den is None else den + term_d
    return events.select(
        key_col,
        ts_col,
        order_col,
        F.col(val_col),
        F.round(num / den, 6).alias("ewma"),
    )
