"""Explicit skew handling: hot-key detection + salted joins/aggregations.

AQE's skew-join splitting covers sort-merge joins at runtime; these
utilities cover the cases AQE can't see — e.g. a hot entity key in an
aggregation or a broadcast-unfriendly dimension join — using the classic
two-pass pattern: a cheap frequency pass finds keys above a threshold,
then only those keys are salted (replicated on the build side, suffixed
on the probe side), so the common case pays nothing.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, functions as F


def hot_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Keys with frequency > threshold (the salting candidates)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > threshold)
        .select(key)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    hot_threshold: Optional[int] = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` (large, possibly skewed) to ``right`` (small-ish)
    on ``key`` with hot keys salted.

    Hot keys in ``left`` get a random-ish salt (stable pmod of a row
    hash); the matching ``right`` rows are replicated ``salt`` times for
    those keys only. Non-hot keys join with salt=0 (no replication).
    """
    if hot_threshold is not None:
        hot = hot_keys(left, key, hot_threshold)
    else:
        hot = left.groupBy(key).agg(F.count(F.lit(1)).alias("cnt")).filter(
            F.col("cnt") > 0
        ).orderBy(F.desc("cnt")).limit(0).select(key)  # empty default
    hot = F.broadcast(hot.withColumn("_is_hot", F.lit(True)))

    l = left.join(hot, key, "left").withColumn(
        "_salt",
        F.when(
            F.col("_is_hot").isNotNull(),
            F.pmod(
                F.hash(*[F.col(c) for c in left.columns]), F.lit(salt)
            ),
        ).otherwise(F.lit(0)),
    ).drop("_is_hot")

    salts = F.explode(
        F.when(
            F.col("_is_hot").isNotNull(),
            F.sequence(F.lit(0), F.lit(salt - 1)),
        ).otherwise(F.array(F.lit(0)))
    ).alias("_salt")
    r = right.join(hot, key, "left").select("*", salts).drop("_is_hot")

    out = l.join(r, [key, "_salt"], how)
    return out.drop("_salt")


def salted_count(
    df: DataFrame, key: str, salt: int = 16
) -> DataFrame:
    """Two-phase aggregation for skewed count: partial count on
    (key, salt) then final sum on key — bounds any single reducer's
    input to ~1/salt of the hottest key."""
    return (
        df.withColumn("_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt)))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").alias("cnt"))
    )
