"""Count-Min-Sketch heavy hitters over a token stream.

The sketch-prescreen + exact-verify pattern the LSH dedup family uses,
applied to frequency: per-partition CMS tables (mergeable by elementwise
sum) are combined into one global sketch; because a CMS estimate NEVER
undercounts, every true heavy hitter survives the prescreen, and an
exact count over the (small) candidate set removes the overcounts — the
final output is EXACT, so the driver oracle is a plain HAVING filter.

Scale posture: two scans of the token stream (one to sketch, one to
probe), one broadcast of the merged sketch (d x w int64, ~1 MB at the
defaults), and an exact groupBy only over candidates (sketch error
bounds the candidate set: P[estimate > true + eps*N] < delta per row).
A plain groupBy+HAVING shuffles EVERY distinct token; this shuffles
only plausible heavy hitters — the win when the token universe is
billions wide and hitters are few.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Tuple

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _cms_params(eps: float, delta: float) -> Tuple[int, int]:
    w = int(np.ceil(np.e / eps))
    d = int(np.ceil(np.log(1.0 / delta)))
    return max(d, 1), max(w, 16)


def _row_hashes(token: str, d: int, w: int) -> np.ndarray:
    # d independent 32-bit slices of one md5 (portable + deterministic)
    h = hashlib.md5(token.encode()).digest()
    out = np.empty(d, dtype=np.int64)
    for i in range(d):
        off = (i * 4) % 12
        out[i] = int.from_bytes(h[off : off + 4], "little") % w
    return out


def heavy_hitters(
    tokens: DataFrame,
    token_col: str = "token",
    threshold: int = 100,
    eps: float = 2e-4,
    delta: float = 1e-3,
) -> DataFrame:
    """(token, n) for every token occurring >= threshold times — EXACT
    output via CMS prescreen + exact verification of candidates."""
    d, w = _cms_params(eps, delta)

    sketch_schema = StructType([StructField("table", BinaryType(), False)])

    def build_sketch(batches) -> Iterator:
        import pandas as pd

        table = np.zeros((d, w), dtype=np.int64)
        for pdf in batches:
            for t in pdf[token_col]:
                if t is None:
                    continue
                rows = _row_hashes(str(t), d, w)
                for i in range(d):
                    table[i, rows[i]] += 1
        yield pd.DataFrame({"table": [table.tobytes()]})

    parts = tokens.select(token_col).mapInPandas(build_sketch, sketch_schema)
    merged = np.zeros((d, w), dtype=np.int64)
    for r in parts.toLocalIterator():  # one ~d*w*8B blob per partition
        merged += np.frombuffer(bytes(r.table), dtype=np.int64).reshape(d, w)
    bc = tokens.sparkSession.sparkContext.broadcast(merged)

    cand_schema = StructType([StructField("token", StringType(), False)])

    def probe(batches) -> Iterator:
        import pandas as pd

        table = bc.value
        seen: set = set()
        out = []
        for pdf in batches:
            for t in pdf[token_col]:
                if t is None or t in seen:
                    continue
                seen.add(t)
                rows = _row_hashes(str(t), d, w)
                est = min(int(table[i, rows[i]]) for i in range(d))
                if est >= threshold:  # estimate >= true: no false negatives
                    out.append(t)
        yield pd.DataFrame({"token": pd.Series(out, dtype="object")})

    candidates = (
        tokens.select(token_col).mapInPandas(probe, cand_schema).distinct()
    )
    # exact verify: count only the candidate tokens
    return (
        tokens.join(
            F.broadcast(candidates),
            tokens[token_col] == candidates["token"],
        )
        .groupBy(candidates["token"])
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold)
    )
