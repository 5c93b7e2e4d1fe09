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
    # distinct, cap per column with a window BEFORE collect (so the
    # driver transfer stays bounded by n_cols * max_values even on
    # high-cardinality columns), instead of one scan+shuffle per column
    values_by_col: Dict[str, List[str]] = {}
    if gazetteer_cols and max_values > 0:
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
        from pyspark.sql import Window

        rn = F.row_number().over(
            Window.partitionBy("col_name").orderBy("value")  # deterministic
        )
        rows = (
            pairs.distinct()
            .withColumn("_rn", rn)
            .filter(F.col("_rn") <= max_values)
            .select("col_name", "value")
            .collect()
        )
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
