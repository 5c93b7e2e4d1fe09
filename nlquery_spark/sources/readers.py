"""Source/sink utilities: format-dispatched table reads and parquet
small-file compaction.

The engine's canonical storage is parquet/Iceberg, but web-scale inputs
arrive in whatever the upstream crawler emitted — these helpers keep
the format decision out of every pipeline definition.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

_EXT_TO_FMT = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: Optional[str] = None,
    schema=None,
    **options,
) -> DataFrame:
    """Read a table, dispatching the format from the path extension when
    ``fmt`` is not given. CSV defaults to header=true + schema inference
    unless an explicit schema is passed (at scale always pass one — an
    inference pass reads the data twice)."""
    lower = path.rstrip("/").lower()
    # crawler outputs are routinely compressed text: strip known
    # compression suffixes before the format match so e.g.
    # logs.jsonl.gz dispatches to the json reader (which handles the
    # codec transparently) instead of the parquet fallback
    for comp in (".gz", ".bz2", ".zst", ".snappy", ".lz4", ".deflate"):
        if lower.endswith(comp):
            lower = lower[: -len(comp)]
            break
    if fmt is None:
        for ext, f in _EXT_TO_FMT.items():
            if lower.endswith(ext):
                fmt = f
                break
        else:
            fmt = "parquet"
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
        if schema is None:
            reader = reader.option("inferSchema", "true")
        if lower.endswith(".tsv"):
            reader = reader.option("sep", "\t")
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def compact_parquet(
    spark: SparkSession, path: str, target_mb: int = 256
) -> int:
    """Rewrite a parquet directory into ~``target_mb`` files and return
    the new file count.

    The 100-TB concern this serves: long-running partitioned sinks
    accumulate small files (one per task per trigger), and scan
    planning cost grows with file count. The rewrite stages into a
    sibling directory, then swaps it in with two Hadoop-FS renames.

    Consistency contract — be honest about the limits: the swap is NOT
    atomic. There is a window between the two renames where ``path``
    does not exist (a concurrent reader gets FileNotFound and should
    retry), and on object stores (s3a) rename itself is a copy. Run
    compaction when the table has no concurrent readers, or use a table
    format (Iceberg rewrite_data_files) for truly atomic compaction —
    which is exactly what the Iceberg-cataloged pipeline path does.
    On failure the original directory is rolled back and the staging
    directory removed.
    """
    from ..plans.pipeline import _fs

    fs, jp = _fs(spark, path)
    summary = fs.getContentSummary(jp)
    total_bytes = summary.getLength()
    n_files = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    fs_tmp, jp_tmp = _fs(spark, tmp)
    old = path.rstrip("/") + "__compact_old"
    _, jp_old = _fs(spark, old)
    if not fs.rename(jp, jp_old):
        fs_tmp.delete(jp_tmp, True)
        raise IOError(f"compact_parquet: could not stage {path}")
    if not fs_tmp.rename(jp_tmp, jp):
        fs.rename(jp_old, jp)  # roll back the original
        fs_tmp.delete(jp_tmp, True)
        raise IOError(f"compact_parquet: could not swap in {tmp}")
    fs.delete(jp_old, True)
    return n_files
