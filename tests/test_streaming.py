"""Structured Streaming wiring: file-stream extraction with availableNow
trigger produces the same triples as the batch path."""

import os

import pytest
from pyspark.sql import functions as F

from nlquery_spark.operators.extract import extract_triples
from nlquery_spark.sources.pages import orders_schema_spec, synth_pages
from nlquery_spark.streaming import (
    read_pages_stream,
    triples_to_sink,
    windowed_mention_rate,
)


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "pages_in")
    out = str(tmp_path / "triples_out")
    ckpt = str(tmp_path / "ckpt")
    pages = synth_pages(spark, 60)
    pages.write.mode("overwrite").parquet(src)

    stream = read_pages_stream(spark, src, max_files_per_trigger=2)
    triples_stream = extract_triples(stream, [orders_schema_spec()])
    q = triples_to_sink(triples_stream, out, ckpt, trigger_once=True)
    q.awaitTermination(120)

    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    batch_pages = spark.read.parquet(src)
    expected = sorted(
        tuple(r) for r in extract_triples(batch_pages, [orders_schema_spec()]).collect()
    )
    assert got == expected
    assert len(got) > 0


def test_windowed_mention_rate_plan(spark, tmp_path):
    src = str(tmp_path / "pages_in2")
    synth_pages(spark, 30).write.mode("overwrite").parquet(src)
    stream = read_pages_stream(spark, src)
    agg = windowed_mention_rate(stream, [orders_schema_spec()])
    assert agg.isStreaming
    q = (
        agg.writeStream.format("memory")
        .queryName("mention_rate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits closed windows; with availableNow + watermark
    # the final watermark update may keep windows open — the plan running
    # end-to-end (state store + watermark wiring) is the assertion here.
    spark.sql("select * from mention_rate").collect()
