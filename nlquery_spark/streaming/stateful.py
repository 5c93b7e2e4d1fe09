"""Custom stateful streaming operator via applyInPandasWithState.

Running per-predicate statistics over the extracted-triples stream: each
micro-batch updates per-key state (total mentions, distinct-ish subject
count via a bounded set, max score) and emits the updated row. This is
the `applyInPandasWithState` pattern the engine uses wherever built-in
streaming aggregations can't express the state (e.g. bounded
top-K/sketches per key at CC scale).
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("pred", StringType(), False),
        StructField("n_mentions", LongType(), False),
        StructField("n_subjects_bounded", LongType(), False),
        StructField("max_score", DoubleType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_mentions", LongType(), False),
        StructField("subjects_csv", StringType(), False),  # bounded sample
        StructField("max_score", DoubleType(), False),
    ]
)

MAX_TRACKED_SUBJECTS = 1000


def _update(
    key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
):
    if state.exists:
        n, subjects_csv, max_score = state.get
        subjects = set(subjects_csv.split("\x00")) if subjects_csv else set()
    else:
        n, subjects, max_score = 0, set(), 0.0
    for pdf in pdfs:
        n += len(pdf)
        if len(subjects) < MAX_TRACKED_SUBJECTS:
            for s in pdf["subj"]:
                subjects.add(s)
                if len(subjects) >= MAX_TRACKED_SUBJECTS:
                    break
        if len(pdf):
            max_score = max(max_score, float(pdf["score"].max()))
    state.update((n, "\x00".join(sorted(subjects)), max_score))
    yield pd.DataFrame(
        {
            "pred": [key[0]],
            "n_mentions": [n],
            "n_subjects_bounded": [len(subjects)],
            "max_score": [max_score],
        }
    )


def streaming_pred_stats(triples_stream: DataFrame) -> DataFrame:
    """triples stream -> running per-predicate stats (update mode)."""
    return triples_stream.groupBy("pred").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
