"""Structured Streaming triple extraction.

The reference is strictly batch (SURVEY.md §2.3: no streaming anywhere);
this module extends the engine so a pages *stream* (e.g. a WARC drop
folder or Kafka topic) feeds the same extraction kernel incrementally:

    readStream -> mapInPandas(extract) -> [watermark] -> agg -> writeStream

The extraction stage is stateless, so it composes with any source/sink;
the windowed mention-rate aggregation shows the stateful path (watermark
+ append mode) for late-arriving warc_ts.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.extract import TRIPLES_SCHEMA, extract_triples
from ..sources.pages import PAGES_SCHEMA


def read_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Stream parquet page files dropped into ``path``."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def extract_triples_stream(
    pages_stream: DataFrame,
    schema_specs: Sequence[Dict],
    options_spec: Optional[Dict] = None,
) -> DataFrame:
    """Same operator as batch — extract_triples is master/stream agnostic
    because it is a stateless mapInPandas."""
    return extract_triples(pages_stream, schema_specs, options_spec)


def triples_to_sink(
    triples_stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    trigger_once: bool = True,
):
    """Append triples to a parquet sink with exactly-once checkpointing."""
    writer = (
        triples_stream.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_mention_rate(
    pages_stream: DataFrame,
    schema_specs: Sequence[Dict],
    options_spec: Optional[Dict] = None,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Stateful path: per-predicate mention counts in event-time windows
    with a watermark for late pages. The join back to warc_ts happens
    before extraction so the event-time column survives the map."""
    with_ts = pages_stream.select("url", "text", "lang", "warc_ts")
    # carry warc_ts through extraction via a url->ts rejoin-free trick:
    # extraction keys on url; embed ts into the stream after extraction
    triples = extract_triples(with_ts, schema_specs, options_spec)
    ts_map = with_ts.select(F.col("url").alias("subj"), "warc_ts")
    enriched = triples.join(ts_map, "subj")
    return (
        enriched.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "pred")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "pred",
            "n_mentions",
        )
    )


def triples_merge_sink(
    triples_stream: DataFrame,
    base_dir: str,
    checkpoint_path: str,
    trigger_once: bool = True,
):
    """Streaming incremental KG maintenance: each micro-batch's triples
    are aggregated (dedup_triples) and MERGED into the running base via
    merge_triple_deltas — the continuous-crawl posture where the triple
    aggregate stays current without re-extracting old pages.

    Exactly-once across restarts: versions are keyed by the streaming
    batchId (``base_dir/v{batchId}``) with a ``_LATEST`` pointer written
    after a version commits. A replayed batch (failure before the
    pointer update) rewrites the SAME version directory from the SAME
    input deterministically, so re-delivery converges instead of
    double-counting. Readers follow ``_LATEST`` (read_latest_triples).

    Scale posture: the per-batch merge shuffles base+delta AGGREGATES
    (triple-universe-sized) on the triple key, never the page corpus; a
    real deployment points base_dir at an Iceberg table and replaces
    the version dance with a MERGE snapshot commit.

    ``base_dir`` must be a LOCAL filesystem path: the ``_LATEST``
    pointer commit uses driver-local open()/os.replace(), whose
    atomicity guarantee does not extend to scheme-prefixed URIs
    (hdfs://, s3a://, ...) — those would silently break exactly-once,
    so they are rejected up front."""
    import os

    from ..operators.extract import dedup_triples, merge_triple_deltas

    base_dir = _require_local_dir(base_dir)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = dedup_triples(batch_df)
        latest = _read_latest_version(base_dir)
        if latest is not None and latest >= batch_id:
            return  # replayed batch already merged and committed
        if latest is None:
            merged = delta
        else:
            base = spark.read.parquet(os.path.join(base_dir, f"v{latest}"))
            merged = merge_triple_deltas(base, delta)
        out = os.path.join(base_dir, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(out)
        tmp = os.path.join(base_dir, "_LATEST.tmp")
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, os.path.join(base_dir, "_LATEST"))

    os.makedirs(base_dir, exist_ok=True)
    writer = (
        triples_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _require_local_dir(base_dir: str) -> str:
    """Reject non-local URIs (ADVICE r3): the _LATEST commit protocol
    relies on POSIX rename atomicity via os.replace(), which a
    distributed-FS URI silently would not get. ``file:`` URIs —
    including Hadoop-style single-slash ``file:/path`` — normalize to a
    plain absolute path when the authority is empty/localhost; any
    other ``scheme://`` raises. A bare local path is passed through
    untouched, including relative paths whose first segment happens to
    contain a colon (``runs:v2/kg``) — those are NOT URIs."""
    import re
    from urllib.parse import unquote, urlparse

    if base_dir.startswith("file:"):
        parsed = urlparse(base_dir)
        if parsed.netloc in ("", "localhost"):
            return unquote(parsed.path)
    elif not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", base_dir):
        return base_dir
    raise ValueError(
        f"triples_merge_sink base_dir must be a local path, got {base_dir!r}: "
        "the _LATEST pointer commit uses driver-local os.replace(), which is "
        "only atomic on a local filesystem — use an Iceberg/transactional "
        "table for distributed storage"
    )


def _read_latest_version(base_dir: str):
    import os

    p = os.path.join(base_dir, "_LATEST")
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        s = fh.read().strip()
    return int(s) if s else None


def read_latest_triples(spark: SparkSession, base_dir: str) -> DataFrame:
    """Current triple aggregate as of the last committed merge."""
    import os

    latest = _read_latest_version(base_dir)
    if latest is None:
        raise FileNotFoundError(f"no committed triple version in {base_dir}")
    return spark.read.parquet(os.path.join(base_dir, f"v{latest}"))
