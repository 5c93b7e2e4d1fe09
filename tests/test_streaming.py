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


def test_stateful_pred_stats(spark, tmp_path):
    """applyInPandasWithState running stats equal batch ground truth."""
    from nlquery_spark.streaming.stateful import streaming_pred_stats

    src = str(tmp_path / "pages_state")
    synth_pages(spark, 80).write.mode("overwrite").parquet(src)
    stream = read_pages_stream(spark, src, max_files_per_trigger=1)
    triples_stream = extract_triples(stream, [orders_schema_spec()])
    stats = streaming_pred_stats(triples_stream)
    q = (
        stats.writeStream.format("memory")
        .queryName("pred_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "select * from pred_stats"
    ).toPandas()
    # last update per pred = final state
    final = rows.groupby("pred").last()

    batch = extract_triples(spark.read.parquet(src), [orders_schema_spec()])
    expected = (
        batch.groupBy("pred")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.countDistinct("subj").alias("n_subjects"),
            F.max("score").alias("max_score"),
        )
        .collect()
    )
    assert len(expected) > 0
    for r in expected:
        got = final.loc[r.pred]
        assert int(got.n_mentions) == r.n_mentions, r.pred
        assert int(got.n_subjects_bounded) == r.n_subjects, r.pred
        assert abs(float(got.max_score) - r.max_score) < 1e-9, r.pred
