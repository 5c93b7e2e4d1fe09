"""Streaming deduplication: exact-dup suppression over a document stream.

The streaming analog of operators.dedup.exact_dedup: each micro-batch's
rows are keyed by content digest and only the first occurrence across
the whole stream survives. With an event-time column, state is bounded
by ``dropDuplicatesWithinWatermark`` (duplicates later than the
watermark delay are assumed impossible upstream — the standard CC-crawl
contract); without one the digest state grows unboundedly, acceptable
only for bounded replays (availableNow).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    watermark_col: Optional[str] = None,
    delay: str = "1 hour",
) -> DataFrame:
    """Keep the first-seen row per distinct text across micro-batches."""
    d = docs.withColumn("_digest", F.md5(F.col(text_col)))
    if watermark_col is not None:
        d = d.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(
            ["_digest"]
        )
    else:
        d = d.dropDuplicates(["_digest"])
    return d.drop("_digest")
