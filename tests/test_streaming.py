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


def test_streaming_sessionize_matches_batch(spark, tmp_path, sf_dir):
    """Custom stateful streaming sessionization (applyInPandasWithState)
    produces exactly the batch lag+cumsum sessionization when events are
    replayed in event-time order across micro-batches."""
    from pyspark.sql import Window

    from nlquery_spark.streaming.stateful import streaming_sessionize

    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("user_id") < 40)
    )
    # event-time-ordered replay: write 6 ts-ranged files one by one
    # (ascending names AND mtimes) so the file source replays each
    # micro-batch strictly later than the previous one
    import glob
    import os
    import shutil

    src = str(tmp_path / "events_in")
    os.makedirs(src)
    ranged = events.withColumn(
        "bucket", F.ntile(6).over(Window.orderBy("ts", "event_id"))
    ).cache()
    for i in range(1, 7):
        slice_dir = str(tmp_path / f"slice{i}")
        ranged.filter(F.col("bucket") == i).drop("bucket").coalesce(
            1
        ).sortWithinPartitions("ts", "event_id").write.mode("overwrite").parquet(
            slice_dir
        )
        part = glob.glob(f"{slice_dir}/part-*.parquet")[0]
        shutil.move(part, f"{src}/{i:02d}.parquet")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, ckpt = str(tmp_path / "sess_out"), str(tmp_path / "sess_ckpt")

    # parquet sinks don't accept update mode: land each micro-batch's
    # update rows via foreachBatch append (downstream dedups snapshots)
    def _sink(batch_df, _bid):
        batch_df.write.mode("append").parquet(out)

    q = (
        streaming_sessionize(stream)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update-mode sink: final snapshot per (user, session) = max n_events
    w = Window.partitionBy("user_id", "session_id").orderBy(F.desc("n_events"))
    got = (
        spark.read.parquet(out)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    import __spark_entry__ as em

    batch = em.queries()["events_sessionize"](spark, sf_dir).filter(
        F.col("user_id") < 40
    )
    g = {(r.user_id, r.session_id): (r.n_events, r.session_start, r.session_end, round(r.sum_value, 2))
         for r in got.collect()}
    b = {(r.user_id, r.session_id): (r.n_events, r.session_start, r.session_end, round(r.sum_value, 2))
         for r in batch.collect()}
    assert g == b and g


def test_streaming_exact_dedup_matches_batch(spark, tmp_path):
    """Exact dedup over a stream keeps one row per distinct text even
    when duplicates span micro-batches, matching the batch operator
    (first-seen == min doc_id under ordered replay)."""
    import glob
    import os
    import shutil

    from nlquery_spark.operators.dedup import exact_dedup
    from nlquery_spark.streaming.dedup import streaming_exact_dedup

    rows = []
    for i in range(40):
        rows.append((i, f"text body {i % 10}"))  # every text repeats 4x
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "docs_in")
    os.makedirs(src)
    for part in range(4):  # duplicates split ACROSS files/batches
        sl = str(tmp_path / f"dslice{part}")
        docs.filter(
            (F.col("doc_id") >= part * 10) & (F.col("doc_id") < (part + 1) * 10)
        ).coalesce(1).sortWithinPartitions("doc_id").write.mode("overwrite").parquet(sl)
        shutil.move(glob.glob(f"{sl}/part-*.parquet")[0], f"{src}/{part:02d}.parquet")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, ckpt = str(tmp_path / "dd_out"), str(tmp_path / "dd_ckpt")
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.doc_id, r.text) for r in spark.read.parquet(out).collect()}
    expected = {(r.doc_id, r.text) for r in exact_dedup(docs).collect()}
    assert got == expected and len(got) == 10


def test_buffered_sessionize_out_of_order_matches_batch(spark, tmp_path, sf_dir):
    """Watermark-buffered sessionization: events arrive out of order
    across micro-batches (bounded by the watermark delay) and sessions
    still emit append-mode equal to the batch sessionization."""
    import glob
    import shutil

    import numpy as np
    from pyspark.sql import Window

    from nlquery_spark.streaming.stateful import streaming_sessionize_buffered

    events = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("user_id") < 30
    )
    # bounded disorder: order by ts + seeded jitter (±45 min), split into
    # sequential files on the JITTERED order -> a "2 hours" watermark
    # covers the lateness
    jitter = (F.hash("event_id") % 5400) - 2700  # seconds
    jittered = events.withColumn(
        "_jts", F.col("ts").cast("timestamp_ltz").cast("long") + jitter
    )
    max_ts = events.agg(F.max("ts")).first()[0]
    # per-user sentinel one day later closes every real session at
    # end-of-stream; its own (still-open) session is never emitted
    import datetime

    sentinel_ts = max_ts + datetime.timedelta(days=1)
    sentinels = (
        events.select("user_id").distinct()
        .withColumn("event_id", F.lit(10_000_000) + F.col("user_id"))
        .withColumn("ts", F.lit(sentinel_ts))
        .withColumn("event_type", F.lit("flush"))
        .withColumn("value", F.lit(0.0))
        .withColumn("props", F.lit("{}"))
        .select(*events.columns)
        .withColumn("_jts", F.lit(2**62))
    )
    allrows = jittered.unionByName(sentinels)
    src = str(tmp_path / "ooo_events")
    os.makedirs(src)
    ranged = allrows.withColumn(
        "bucket", F.ntile(6).over(Window.orderBy("_jts", "event_id"))
    ).cache()
    for i in range(1, 7):
        sl = str(tmp_path / f"ooo{i}")
        ranged.filter(F.col("bucket") == i).drop("bucket", "_jts").coalesce(
            1
        ).write.mode("overwrite").parquet(sl)
        shutil.move(glob.glob(f"{sl}/part-*.parquet")[0], f"{src}/{i:02d}.parquet")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, ckpt = str(tmp_path / "ooo_out"), str(tmp_path / "ooo_ckpt")
    q = (
        streaming_sessionize_buffered(stream, watermark_delay="2 hours")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = {
        (r.user_id, r.session_id): (r.n_events, r.session_start, r.session_end,
                                    round(r.sum_value, 2))
        for r in spark.read.parquet(out).collect()
    }
    import __spark_entry__ as em

    batch = em.queries()["events_sessionize"](spark, sf_dir).filter(
        F.col("user_id") < 30
    )
    b = {
        (r.user_id, r.session_id): (r.n_events, r.session_start, r.session_end,
                                    round(r.sum_value, 2))
        for r in batch.collect()
    }
    assert got == b and got  # sentinel sessions never emitted; rest exact


def test_sessionize_update_accepts_tz_aware_ts():
    """_sessionize_update must normalize tz-aware event time (what a
    timestamp_ltz column becomes in pandas) exactly like the buffered
    variant — same sessions as the tz-naive equivalent input."""
    import pandas as pd

    from nlquery_spark.streaming.stateful import _sessionize_update

    class FakeState:
        exists = False

        def update(self, v):
            self.exists, self._v = True, v

        @property
        def get(self):
            return self._v

    naive = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:10:00", "2024-01-01 02:00:00"]
            ),
            "event_id": [1, 2, 3],
            "value": [1.0, 2.0, 3.0],
        }
    )
    aware = naive.copy()
    aware["ts"] = aware["ts"].dt.tz_localize("UTC")
    out_naive = list(_sessionize_update((7,), iter([naive]), FakeState(), 1800))[0]
    out_aware = list(_sessionize_update((7,), iter([aware]), FakeState(), 1800))[0]
    pd.testing.assert_frame_equal(out_naive, out_aware)
    assert list(out_naive["session_id"]) == [1, 2]  # 2h gap splits sessions


def test_interval_join_stream_matches_batch(spark, tmp_path, sf_dir):
    """Watermarked stream-stream interval join (purchases x preceding
    clicks within 30 min per user) emits exactly the batch join's pairs
    when the same events replay across micro-batches."""
    import glob
    import os
    import shutil

    from pyspark.sql import Window

    from nlquery_spark.streaming.joins import interval_join_stream

    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("user_id") < 40)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    purchases = events.filter(F.col("event_type") == "purchase")
    clicks = events.filter(F.col("event_type") == "click")
    batch = {
        (r.event_id, r.r_event_id)
        for r in interval_join_stream(
            purchases, clicks, "user_id", "ts", "ts", window_sec=1800
        ).collect()
    }
    assert batch, "fixture must produce click->purchase attributions"

    # ordered replay: 4 ts-ranged slices with ascending names+mtimes
    src = str(tmp_path / "ev_in")
    os.makedirs(src)
    ranged = events.withColumn(
        "bucket", F.ntile(4).over(Window.orderBy("ts", "event_id"))
    ).cache()
    for i in range(1, 5):
        sdir = str(tmp_path / f"sl{i}")
        ranged.filter(F.col("bucket") == i).drop("bucket").coalesce(1).write.mode(
            "overwrite"
        ).parquet(sdir)
        shutil.move(glob.glob(f"{sdir}/part-*.parquet")[0], f"{src}/{i:02d}.parquet")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    joined = interval_join_stream(
        stream.filter(F.col("event_type") == "purchase"),
        stream.filter(F.col("event_type") == "click"),
        "user_id",
        "ts",
        "ts",
        window_sec=1800,
        watermark_delay="120 minutes",
    )
    out, ckpt = str(tmp_path / "ij_out"), str(tmp_path / "ij_ckpt")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = {
        (r.event_id, r.r_event_id) for r in spark.read.parquet(out).collect()
    }
    assert got == batch


def test_streaming_incremental_merge_matches_batch(spark, tmp_path):
    """Continuous-crawl KG maintenance: micro-batched pages merged
    incrementally (dedup per batch + merge_triple_deltas into a
    versioned base) must equal one-shot batch extraction+dedup over all
    pages — including support counts."""
    import glob
    import os
    import shutil

    from nlquery_spark.operators.extract import dedup_triples, extract_triples
    from nlquery_spark.sources.pages import orders_schema_spec, synth_pages
    from nlquery_spark.streaming.extract import (
        read_latest_triples,
        read_pages_stream,
        triples_merge_sink,
    )

    spec = [orders_schema_spec()]
    pages = synth_pages(spark, 120)
    src = str(tmp_path / "pages_in")
    os.makedirs(src)
    # 3 ordered slices -> >= 2 micro-batches at maxFilesPerTrigger=1
    for i in range(3):
        sdir = str(tmp_path / f"ps{i}")
        pages.filter(F.crc32(F.col("url")) % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(sdir)
        shutil.move(glob.glob(f"{sdir}/part-*.parquet")[0], f"{src}/{i:02d}.parquet")
    stream = read_pages_stream(spark, src, max_files_per_trigger=1)
    base, ckpt = str(tmp_path / "kg_base"), str(tmp_path / "kg_ckpt")
    q = triples_merge_sink(extract_triples(stream, spec), base, ckpt)
    q.awaitTermination(240)
    got = {tuple(r) for r in read_latest_triples(spark, base).collect()}
    want = {tuple(r) for r in dedup_triples(extract_triples(pages, spec)).collect()}
    assert want and got == want
    # versioned history exists and _LATEST points at the newest merge
    versions = sorted(p for p in os.listdir(base) if p.startswith("v"))
    assert len(versions) >= 2


def test_triples_merge_sink_resumes_from_checkpoint(spark, tmp_path):
    """Continuous-crawl restart contract: a first availableNow run
    merges the crawl slices present so far; after a stop (crash /
    scheduled restart) a NEW query over the same checkpoint + base must
    process ONLY the slices that arrived since, and the final aggregate
    must equal one-shot batch extraction over everything. If restart
    re-delivered the old slices into the merge, the support counts of
    their triples would double and the equality would fail — so this
    pins exactly-once across restarts, not just within one run."""
    import glob
    import os
    import shutil

    from nlquery_spark.operators.extract import dedup_triples, extract_triples
    from nlquery_spark.sources.pages import orders_schema_spec, synth_pages
    from nlquery_spark.streaming.extract import (
        read_latest_triples,
        read_pages_stream,
        triples_merge_sink,
    )

    spec = [orders_schema_spec()]
    pages = synth_pages(spark, 120)
    src = str(tmp_path / "pages_in")
    os.makedirs(src)

    def stage_slice(i):
        sdir = str(tmp_path / f"ps{i}")
        pages.filter(F.crc32(F.col("url")) % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(sdir)
        shutil.move(
            glob.glob(f"{sdir}/part-*.parquet")[0], f"{src}/{i:02d}.parquet"
        )

    base, ckpt = str(tmp_path / "kg_base"), str(tmp_path / "kg_ckpt")
    stage_slice(0)
    q1 = triples_merge_sink(
        extract_triples(read_pages_stream(spark, src, max_files_per_trigger=1), spec),
        base,
        ckpt,
    )
    q1.awaitTermination(240)
    first = {tuple(r) for r in read_latest_triples(spark, base).collect()}
    slice0 = pages.filter(F.crc32(F.col("url")) % 3 == 0)
    assert first == {
        tuple(r) for r in dedup_triples(extract_triples(slice0, spec)).collect()
    }

    # the crawl continues while the job is down; restart from checkpoint
    stage_slice(1)
    stage_slice(2)
    q2 = triples_merge_sink(
        extract_triples(read_pages_stream(spark, src, max_files_per_trigger=1), spec),
        base,
        ckpt,
    )
    q2.awaitTermination(240)
    got = {tuple(r) for r in read_latest_triples(spark, base).collect()}
    want = {tuple(r) for r in dedup_triples(extract_triples(pages, spec)).collect()}
    assert want and got == want


def test_triples_merge_sink_rejects_remote_base_dir():
    import pytest

    from nlquery_spark.streaming.extract import _require_local_dir

    assert _require_local_dir("/tmp/x") == "/tmp/x"
    assert _require_local_dir("file:///tmp/x") == "/tmp/x"
    for uri in ("hdfs://nn/kg", "s3a://bucket/kg", "abfss://c@a/kg"):
        with pytest.raises(ValueError, match="local path"):
            _require_local_dir(uri)


def test_session_window_semantics_pinned(spark):
    """Inclusive-at-gap merge rule and end = last_ts + gap — the exact
    semantics the streaming_session_windows oracle mirrors in SQL."""
    import datetime as dt

    from nlquery_spark.streaming import session_window_stats

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base),
        (1, base + dt.timedelta(seconds=1800)),  # exactly gap -> merge
        (2, base),
        (2, base + dt.timedelta(seconds=1800, microseconds=1)),  # split
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sorted(
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in session_window_stats(df).collect()
    )
    assert out == [
        (1, "2024-01-01 00:00:00", "2024-01-01 01:00:00", 2),
        (2, "2024-01-01 00:00:00", "2024-01-01 00:30:00", 1),
        (2, "2024-01-01 00:30:00.000001", "2024-01-01 01:00:00.000001", 1),
    ]


def test_streaming_session_windows_equals_batch(spark, sf_dir):
    """The streamed complete-mode snapshot must equal the batch
    session_window aggregation on the same events."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    from nlquery_spark.streaming import session_window_stats

    got = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in em.queries()["streaming_session_windows"](spark, sf_dir).collect()
    }
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp_ltz").alias("ts")
    )
    batch = session_window_stats(events)
    want = {
        (r.user_id, s, e): r.n_events
        for r in batch.select(
            "user_id",
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("s"),
            F.date_format("session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("e"),
            "n_events",
        ).collect()
        for s, e in [(r.s, r.e)]
    }
    assert got == want
