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
    for col in value_columns:
        datatype = _infer_datatype(df, col)
        entry: Dict = {
            "caption": captions.get(col, col.replace("_", " ").strip()),
            "name": col,
            "datatype": datatype,
        }
        if datatype == "string":
            values = [
                r[0]
                for r in df.select(col)
                .filter(F.col(col).isNotNull())
                .distinct()
                .orderBy(col)  # deterministic gazetteer order
                .limit(max_values)
                .collect()
            ]
            if values:
                entry["values"] = [str(v) for v in values]
        cols.append(entry)
    return {
        "caption": caption or name.replace("_", " ").strip(),
        "name": name,
        "columns": cols,
    }
