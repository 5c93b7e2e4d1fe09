"""Stream-stream interval join: the streaming analog of the batch
as-of/attribution pattern (purchase_attribution), built on Structured
Streaming's watermarked inner interval join.

Semantics: every (left, right) pair with the same key and
``left.ts - window <= right.ts <= left.ts`` — e.g. purchases joined to
the impressions that preceded them within the attribution window.

Scale posture: both sides carry event-time watermarks, so state for a
key is BOUNDED — Spark drops buffered rows once the watermark passes
``ts + window`` (without the time-range predicate the join state grows
forever; Structured Streaming refuses unbounded stream-stream joins in
append mode for exactly that reason). The join itself is one shuffle on
the key per side, identical to the batch plan; late rows beyond
``watermark_delay`` are dropped deterministically by the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    window_sec: int,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Watermarked inner interval join of two streaming DataFrames.

    Columns from both sides are kept (right's key/time aliased with a
    ``r_`` prefix to avoid ambiguity). Works identically on BATCH
    DataFrames (watermarks are a no-op there), which is how the parity
    test pins stream == batch.
    """
    lt, rt = f"l_{left_time}", f"r_{right_time}"
    l = left.select(
        F.col(on).alias("l_key"),
        F.col(left_time).cast("timestamp_ltz").alias(lt),
        *[c for c in left.columns if c not in (on, left_time)],
    )
    r = right.select(
        F.col(on).alias("r_key"),
        F.col(right_time).cast("timestamp_ltz").alias(rt),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (on, right_time)
        ],
    )
    if l.isStreaming:
        l = l.withWatermark(lt, watermark_delay)
    if r.isStreaming:
        r = r.withWatermark(rt, watermark_delay)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col(rt) <= F.col(lt))
        & (F.col(rt) >= F.col(lt) - F.expr(f"INTERVAL {window_sec} SECOND"))
    )
    return l.join(r, cond, "inner").drop("r_key")
