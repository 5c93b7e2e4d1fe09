"""Dictionary (TableSchema spec) inference from DataFrames.

The reference builds dictionaries from datasets: NerByDataset loads
MovieLens rows into column gazetteers
(examples/.../NerByDataset/Program.cs:87-115) and NliPivotTable infers
the schema from cube dimensions, detecting date dimensions by
year/month/day name suffixes
(examples/.../NliPivotTable/Services/QueryParser.cs:122-200). This
module is the distributed analog: gazetteer values are collected with
``distinct().limit(...)`` per column (one Spark job, broadcast-sized
output) and datatypes inferred from Spark types + name suffixes.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DateType, NumericType, TimestampType, TimestampNTZType

# reference's trial-mode cap, kept as a sane broadcast bound
MAX_VALUES_PER_COLUMN = 5000

_DATE_SUFFIXES = ("year", "month", "day", "date")


def _infer_datatype(df: DataFrame, col: str) -> str:
    dtype = df.schema[col].dataType
    if isinstance(dtype, (DateType, TimestampType, TimestampNTZType)):
        return "date"
    name = col.lower()
    if any(name.endswith(s) for s in _DATE_SUFFIXES):
        # PivotTable-style suffix detection (QueryParser.cs:122-200)
        return "date"
    if isinstance(dtype, NumericType):
        return "number"
    return "string"


def capped_value_pairs(
    df: DataFrame, gazetteer_cols: Sequence[str], max_values: int
) -> DataFrame:
    """(col_name, value): the ``max_values`` lexicographically-smallest
    distinct values of each gazetteer column, as a two-level bounded
    top-k — NOT one global window per column: a row_number over
    (col_name) alone lands EVERY distinct value of a column on one task,
    a straggler/OOM on a 100-TB table with a high-cardinality string
    column. Level 1 caps within (col_name, salt) — n_salts-way parallel,
    output <= n_salts*max_values rows per column; level 2 re-caps over
    that bounded set. Exact and deterministic: a value's rank within its
    salt group is <= its global rank, so the global smallest max_values
    always survive level 1."""
    from pyspark.sql import Window

    if not gazetteer_cols:
        return df.sparkSession.createDataFrame(
            [], "col_name string, value string"
        )
    pairs = None
    for c in gazetteer_cols:
        p = (
            df.select(
                F.lit(c).alias("col_name"),
                F.col(c).cast("string").alias("value"),
            )
            .filter(F.col(c).isNotNull())
        )
        pairs = p if pairs is None else pairs.unionAll(p)
    n_salts = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    salted = pairs.distinct().withColumn(
        "_salt", F.pmod(F.xxhash64("value"), F.lit(n_salts))
    )
    rn1 = F.row_number().over(
        Window.partitionBy("col_name", "_salt").orderBy("value")
    )
    rn2 = F.row_number().over(
        Window.partitionBy("col_name").orderBy("value")  # bounded input
    )
    return (
        salted.withColumn("_rn1", rn1)
        .filter(F.col("_rn1") <= max_values)
        .withColumn("_rn2", rn2)
        .filter(F.col("_rn2") <= max_values)
        .select("col_name", "value")
    )


def spec_from_dataframe(
    df: DataFrame,
    name: str,
    caption: Optional[str] = None,
    value_columns: Optional[Sequence[str]] = None,
    caption_overrides: Optional[Dict[str, str]] = None,
    max_values: int = MAX_VALUES_PER_COLUMN,
) -> Dict:
    """Build a broadcastable dictionary spec from a DataFrame.

    ``value_columns``: columns whose distinct values become gazetteers
    (string columns only; numeric/date columns contribute captions +
    datatype so number/date matchers engage). Default: all columns.
    """
    captions = caption_overrides or {}
    cols: List[Dict] = []
    value_columns = list(value_columns if value_columns is not None else df.columns)
    datatypes = {c: _infer_datatype(df, c) for c in value_columns}
    gazetteer_cols = [c for c in value_columns if datatypes[c] == "string"]

    # all gazetteers in ONE job: union the (col_name, value) pairs,
    # distinct, cap per column BEFORE collect (so the driver transfer
    # stays bounded by n_cols * max_values even on high-cardinality
    # columns), instead of one scan+shuffle per column
    values_by_col: Dict[str, List[str]] = {}
    if gazetteer_cols and max_values > 0:
        rows = capped_value_pairs(df, gazetteer_cols, max_values).collect()
        for r in rows:
            values_by_col.setdefault(r.col_name, []).append(r.value)
        for vs in values_by_col.values():
            vs.sort()

    for col in value_columns:
        datatype = datatypes[col]
        entry: Dict = {
            "caption": captions.get(col, col.replace("_", " ").strip()),
            "name": col,
            "datatype": datatype,
        }
        if values_by_col.get(col):
            entry["values"] = values_by_col[col]
        cols.append(entry)
    return {
        "caption": caption or name.replace("_", " ").strip(),
        "name": name,
        "columns": cols,
    }
