"""Approximate-nearest-neighbor search over an embedding column.

Two paths:
- ``cosine_topk_bruteforce``: exact top-k via JVM-side zip_with/aggregate
  dot products + a per-query window. The correctness baseline; also the
  oracle-checkable path (ANSI-SQL expressible).
- ``cosine_topk_blocked``: the scale path — a vectorized numpy pandas-UDF
  computes per-partition partial top-k with one matrix multiply per Arrow
  batch (queries broadcast), then a global top-k merge. Work per executor
  is a dense GEMM (cache-friendly), shuffle is only k rows per
  (query, partition).
- ``ivf_topk``: IVF-style pruning — k-means-lite centroids (seeded,
  deterministic) assign each corpus vector to a cell; queries probe the
  ``nprobe`` nearest cells only.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(v):
    return F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v_: acc + v_,
        )
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    query_ids: Sequence[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for the given query ids against the full corpus.

    The query side is tiny -> broadcast join; the join is a map-side
    nested loop, no shuffle of the corpus.
    """
    q = corpus.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("qvec"), F.col("cvec"))
                / (_norm(F.col("qvec")) * _norm(F.col("cvec"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


_TOPK_SCHEMA = StructType(
    [
        StructField("query_id", LongType(), False),
        StructField("neighbor_id", LongType(), False),
        StructField("cosine", DoubleType(), False),
    ]
)


def cosine_topk_blocked(
    corpus: DataFrame,
    queries: Optional[DataFrame] = None,
    query_ids: Optional[Sequence[int]] = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path: numpy GEMM per Arrow batch -> partial top-k -> global
    window top-k. Shuffle volume: O(#queries * k * #batches) rows."""
    if queries is None:
        queries = corpus.filter(F.col(id_col).isin(list(query_ids)))
    qrows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[1] for r in qrows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat, k))

    def partial_topk(batches):
        import pandas as pd

        ids_q, mat_q, kk = bc.value
        for pdf in batches:
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(c_ids) == 0:
                continue
            c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = mat_q @ c_mat.T  # (nq, nc)
            out_q, out_n, out_s = [], [], []
            top = min(kk + 1, sims.shape[1])
            idx = np.argpartition(-sims, top - 1, axis=1)[:, :top]
            for qi in range(sims.shape[0]):
                for ci in idx[qi]:
                    if c_ids[ci] == ids_q[qi]:
                        continue
                    out_q.append(int(ids_q[qi]))
                    out_n.append(int(c_ids[ci]))
                    out_s.append(round(float(sims[qi, ci]), 6))
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_s}
            )

    partial = corpus.select(id_col, vec_col).mapInPandas(partial_topk, _TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def ivf_topk(
    corpus: DataFrame,
    query_ids: Sequence[int],
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_size: int = 2048,
) -> DataFrame:
    """IVF-pruned ANN: deterministic sampled centroids; corpus vectors are
    assigned to their nearest cell (one numpy pass); each query scans only
    its ``nprobe`` closest cells. Recall < 1.0 by design; at CC scale the
    cell assignment becomes the partitioning key so a probe touches only
    nprobe/n_cells of the data."""
    sample = corpus.select(vec_col).limit(sample_size).collect()
    mat = np.array([r[0] for r in sample], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)]
    # one Lloyd refinement pass for stability (still deterministic)
    assign = np.argmax(mat @ centroids.T, axis=1)
    for c in range(len(centroids)):
        members = mat[assign == c]
        if len(members):
            v = members.mean(axis=0)
            centroids[c] = v / np.linalg.norm(v)
    bc = corpus.sparkSession.sparkContext.broadcast(centroids)

    cell_schema = StructType(
        [StructField("id", LongType(), False), StructField("cell", LongType(), False)]
    )

    def assign_cells(batches):
        import pandas as pd

        cents = bc.value
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            if len(ids) == 0:
                continue
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            cells = np.argmax(m @ cents.T, axis=1)
            yield pd.DataFrame({"id": ids, "cell": cells.astype(np.int64)})

    cells = corpus.select(id_col, vec_col).mapInPandas(assign_cells, cell_schema)
    corpus_cells = corpus.join(
        cells.withColumnRenamed("id", id_col), id_col
    )

    qrows = corpus.filter(F.col(id_col).isin(list(query_ids))).select(id_col, vec_col).collect()
    probe_rows: List = []
    cents = centroids
    for r in qrows:
        qv = np.array(r[1], dtype=np.float64)
        qv /= np.linalg.norm(qv)
        order = np.argsort(-(cents @ qv))[:nprobe]
        for c in order:
            probe_rows.append((int(r[0]), int(c)))
    probes = corpus.sparkSession.createDataFrame(probe_rows, "query_id long, cell long")

    pruned = corpus_cells.join(F.broadcast(probes), "cell").filter(
        F.col(id_col) != F.col("query_id")
    )
    q = corpus.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    scored = pruned.join(F.broadcast(q), "query_id").withColumn(
        "cosine",
        F.round(
            _dot(F.col("qvec"), F.col(vec_col))
            / (_norm(F.col("qvec")) * _norm(F.col(vec_col))),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col(id_col).alias("neighbor_id"), "cosine")
    )
