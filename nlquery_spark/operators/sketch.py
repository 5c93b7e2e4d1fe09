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


def _row_hash_matrix(tokens_arr: np.ndarray, d: int, w: int) -> np.ndarray:
    """(d, n) CMS row indices for a whole token batch, vectorized.

    Kirsch-Mitzenmacher double hashing — row_i = (h1 + i*h2) mod w over
    two independent siphash keys — is a valid CMS hash family, and the
    sketch only shapes the CANDIDATE SUPERSET (estimates never
    undercount under any fixed hash; the exact-verify pass removes
    every overcount), so the operator's output is hash-independent.
    Replaces d per-token Python md5 calls (optimization r9, guide §4.2:
    the per-task work was interpreter-bound md5 loops over every
    distinct token, twice per corpus scan)."""
    import pandas as pd

    h1 = pd.util.hash_array(tokens_arr, hash_key="nlq-cms-h1-v1-00").astype(
        np.uint64
    )
    h2 = pd.util.hash_array(tokens_arr, hash_key="nlq-cms-h2-v1-00").astype(
        np.uint64
    )
    i = np.arange(d, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(w)).astype(np.int64)


def heavy_hitters(
    tokens: DataFrame,
    token_col: str = "token",
    threshold: int = 100,
    eps: float = 2e-4,
    delta: float = 1e-3,
    eager: bool = True,
) -> DataFrame:
    """(token, n) for every token occurring >= threshold times — EXACT
    output via CMS prescreen + exact verification of candidates.

    The token lineage is consumed three times (sketch build, probe,
    exact verify), so it is persisted here; callers re-deriving tokens
    from raw documents would otherwise pay the scan three times.

    With ``eager`` (the default) the small result is materialized via
    localCheckpoint and the persisted token cache + sketch broadcast are
    released before returning, so repeated calls in a long-lived session
    do not accumulate cached partitions or broadcast blocks. Pass
    ``eager=False`` to keep the plan lazy — then the caller owns cleanup
    (``spark.catalog.clearCache()`` or session teardown)."""
    from pyspark import StorageLevel

    tokens = tokens.select(token_col).persist(StorageLevel.MEMORY_AND_DISK)
    d, w = _cms_params(eps, delta)

    sketch_schema = StructType([StructField("table", BinaryType(), False)])

    def build_sketch(batches) -> Iterator:
        import pandas as pd

        table = np.zeros((d, w), dtype=np.int64)
        for pdf in batches:
            # heavy-hitter streams are Zipfian: hash each DISTINCT token
            # once per batch and add its count, not once per occurrence
            counts = pdf[token_col].dropna().value_counts()
            if not len(counts):
                continue
            rows = _row_hash_matrix(
                counts.index.to_numpy(dtype=object), d, w
            )
            cnts = counts.to_numpy(dtype=np.int64)
            for i in range(d):
                np.add.at(table[i], rows[i], cnts)
        yield pd.DataFrame({"table": [table.tobytes()]})

    parts = tokens.mapInPandas(build_sketch, sketch_schema)
    merged = np.zeros((d, w), dtype=np.int64)
    # collect, not toLocalIterator: one ~d*w*8B blob per partition, and
    # toLocalIterator fetches them in serial per-partition round trips
    # (measured 8.4 s vs 3.1 s for the same job at sf1 — guide §5: the
    # driver transfer itself is tiny, the latency was the cost)
    for r in parts.collect():
        merged += np.frombuffer(bytes(r.table), dtype=np.int64).reshape(d, w)
    bc = tokens.sparkSession.sparkContext.broadcast(merged)

    cand_schema = StructType([StructField("token", StringType(), False)])

    def probe(batches) -> Iterator:
        import pandas as pd

        table = bc.value
        for pdf in batches:
            # memory bounded at batch size: per-batch dedup only, the
            # downstream .distinct() collapses cross-batch repeats
            uniq = pdf[token_col].dropna().unique()
            if not len(uniq):
                yield pd.DataFrame({"token": pd.Series([], dtype="object")})
                continue
            uniq = np.asarray(uniq, dtype=object)
            rows = _row_hash_matrix(uniq, d, w)
            # estimate >= true: no false negatives
            est = np.take_along_axis(table, rows, axis=1).min(axis=0)
            yield pd.DataFrame(
                {"token": pd.Series(uniq[est >= threshold], dtype="object")}
            )

    candidates = tokens.mapInPandas(probe, cand_schema).distinct()
    # exact verify: count only the candidate tokens
    result = (
        tokens.join(
            F.broadcast(candidates),
            tokens[token_col] == candidates["token"],
        )
        .groupBy(candidates["token"])
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold)
    )
    if eager:
        # heavy hitters are few by definition: checkpointing the result is
        # cheap, and lets us release the token cache + sketch broadcast now
        result = result.localCheckpoint(eager=True)
        tokens.unpersist()
        bc.unpersist()
    return result
