"""Source readers + parquet compaction."""

import glob

from pyspark.sql import functions as F

from nlquery_spark.sources.readers import compact_parquet, read_table


def test_read_table_format_dispatch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    ).limit(200)
    rows = sorted(tuple(r) for r in events.collect())

    pq = str(tmp_path / "e.parquet")
    cs = str(tmp_path / "e.csv")
    js = str(tmp_path / "e.jsonl")
    events.write.parquet(pq)
    events.write.option("header", "true").csv(cs)
    events.write.json(js)

    assert sorted(tuple(r) for r in read_table(spark, pq).collect()) == rows
    got_csv = read_table(spark, cs, schema=events.schema).select(*events.columns)
    assert sorted(tuple(r) for r in got_csv.collect()) == rows
    got_js = read_table(spark, js, schema=events.schema).select(*events.columns)
    assert sorted(tuple(r) for r in got_js.collect()) == rows


def test_compact_parquet_reduces_files(spark, tmp_path):
    path = str(tmp_path / "many")
    df = spark.range(5000).withColumn("v", F.col("id") * 2)
    df.repartition(24).write.parquet(path)
    assert len(glob.glob(f"{path}/part-*.parquet")) == 24
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    n = compact_parquet(spark, path, target_mb=256)
    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) == n == 1  # tiny data -> one target file
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert before == after
    assert not glob.glob(f"{path}__compact_*")  # staging dirs cleaned


def test_read_table_compressed_extension_dispatch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "event_type"
    ).limit(50)
    js = str(tmp_path / "e2.jsonl.gz")
    events.write.option("compression", "gzip").json(js)
    got = read_table(spark, js, schema=events.schema).select(*events.columns)
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in events.collect()
    )


def test_sample_frames_rejects_nonpositive_interval(spark):
    import pytest as _pytest

    from nlquery_spark.operators.multimodal import sample_frames, synth_media

    with _pytest.raises(ValueError):
        sample_frames(synth_media(spark, 3), every_ms=0)
