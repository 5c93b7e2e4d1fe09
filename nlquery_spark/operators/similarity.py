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

from ..functions.vectors import cosine as _cosine
from pyspark.sql.types import (
    ArrayType,
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
            # shared zero-norm-safe cosine (functions.vectors.cosine):
            # a zero vector scores 0.0 instead of raising DIVIDE_BY_ZERO
            # under ANSI mode — zero embeddings (empty docs, padding)
            # are a real corpus artifact (round-8 fuzz finding)
            "cosine",
            F.round(_cosine(F.col("qvec"), F.col("cvec")), 6),
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


_PAIRS_SCHEMA = StructType(
    [
        StructField("id_a", LongType(), False),
        StructField("id_b", LongType(), False),
        StructField("cosine", DoubleType(), False),
    ]
)


def cosine_allpairs_exact(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
    tile: int = 4096,
) -> DataFrame:
    """EXACT all-pairs cosine >= threshold via a distributed triangle join.

    Every vector is normalized once and hashed to a block ``b``; each row
    is then replicated to the ``n_blocks`` unordered block-pairs containing
    ``b``, and each (i, j) group computes a single tiled GEMM between its
    side-i and side-j rows (upper triangle when i == j). Work is O(n^2)
    — exactness costs that — but it is spread over B*(B+1)/2 independent
    tasks with B-fold replication, so per-task memory is bounded and the
    plan scales out; choose B ~ sqrt(2 * target_tasks). This is the
    bruteforce baseline LSH recall is measured against, and the
    oracle-checkable exact path (SQL: self-join + list_dot_product).
    For large corpora prefer embedding_neardup_pairs (OR-amplified LSH).
    """
    B = n_blocks

    sig_schema = StructType(
        [
            StructField("key", LongType(), False),
            StructField("block", LongType(), False),
            StructField("id", LongType(), False),
            StructField("unit", ArrayType(DoubleType(), False), False),
        ]
    )

    def fan_out(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(x, axis=1)
            norms[norms == 0] = 1.0
            unit = x / norms[:, None]
            blocks = (ids % B + B) % B  # deterministic, sign-safe
            # vectorized B-fold fan-out (optimization r9, guide §4.2):
            # the per-row Python loop built n*B rows by list append
            jg = np.arange(B, dtype=np.int64)[None, :]
            bcol = blocks[:, None]
            key = (
                np.minimum(bcol, jg) * B + np.maximum(bcol, jg)
            ).reshape(-1)
            yield pd.DataFrame(
                {
                    "key": key,
                    "block": np.repeat(blocks, B),
                    "id": np.repeat(ids, B),
                    "unit": list(np.repeat(unit, B, axis=0)),
                }
            )

    def verify_pair(pdf):
        import pandas as pd

        key = int(pdf["key"].iloc[0])
        i, j = key // B, key % B
        ids = pdf["id"].to_numpy()
        u = np.array(pdf["unit"].tolist(), dtype=np.float64)
        blk = pdf["block"].to_numpy()
        ia, ib, cs = [], [], []

        def emit(rows_idx, cols_idx, triangle):
            # same vectorized selection as dedup._verify_tile
            # (optimization r9): cheap >= pre-mask instead of np.round
            # over the full tile, numpy masks instead of a per-pair
            # Python loop; emitted cosine stays Python round(float, 6)
            # for bit parity with the previous loop and the oracle.
            ur, uc = u[rows_idx], u[cols_idx]
            idr, idc = ids[rows_idx], ids[cols_idx]
            for r0 in range(0, len(idr), tile):
                r1 = min(r0 + tile, len(idr))
                for c0 in range(0, len(idc), tile):
                    c1 = min(c0 + tile, len(idc))
                    sims = ur[r0:r1] @ uc[c0:c1].T
                    rr, cc = np.nonzero(sims >= threshold - 1e-6)
                    if len(rr):
                        keep = np.round(sims[rr, cc], 6) >= threshold
                        rr, cc = rr[keep], cc[keep]
                    if triangle:
                        keep = (r0 + rr) < (c0 + cc)
                        rr, cc = rr[keep], cc[keep]
                    av, bv = idr[r0 + rr], idc[c0 + cc]
                    keep = av != bv
                    av, bv, rr, cc = av[keep], bv[keep], rr[keep], cc[keep]
                    ia.append(np.minimum(av, bv))
                    ib.append(np.maximum(av, bv))
                    cs.append([round(float(v), 6) for v in sims[rr, cc]])

        if i == j:
            idx = np.arange(len(ids))
            emit(idx, idx, triangle=True)
        else:
            emit(np.nonzero(blk == i)[0], np.nonzero(blk == j)[0], triangle=False)
        if not ia:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        return pd.DataFrame(
            {
                "id_a": np.concatenate(ia),
                "id_b": np.concatenate(ib),
                "cosine": np.fromiter(
                    (v for chunk in cs for v in chunk), np.float64
                ),
            }
        )

    fanned = df.select(id_col, vec_col).mapInPandas(fan_out, sig_schema)
    return fanned.groupBy("key").applyInPandas(lambda p: verify_pair(p), _PAIRS_SCHEMA)


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
    # deterministic training draw (same fix as pq_topk, ADVICE r3 /
    # VERDICT r6 item 4): a bare limit() without ordering picks whatever
    # partitions answer first, so the centroids — and hence cell
    # assignments and top-k results — depended on the physical layout.
    # Ordering by xxhash64(id) is a layout-independent pseudo-random
    # sample, and Spark executes orderBy+limit as TakeOrderedAndProject
    # (per-partition top-n + driver merge), never a full corpus sort.
    sample = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_size)
        .collect()
    )
    mat = np.array([r[1] for r in sample], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)]
    # a few Lloyd refinement passes (still deterministic; converges on
    # the sample in <10 rounds — better-shaped cells mean fewer probes
    # for the same recall)
    for _ in range(8):
        assign = np.argmax(mat @ centroids.T, axis=1)
        moved = False
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                v = v / np.linalg.norm(v)
                if not np.allclose(v, centroids[c]):
                    centroids[c] = v
                    moved = True
        if not moved:
            break
    bc = corpus.sparkSession.sparkContext.broadcast(centroids)

    # carry the vector THROUGH the assignment stage (optimization r9,
    # guide §2.4): emitting only (id, cell) forced a corpus⋈cells
    # shuffle join on id to re-attach the embeddings — two exchanges of
    # the vector payload for a column the Python stage already held.
    # Downstream needs exactly (id, vec, cell); nothing else survives
    # column pruning anyway.
    cell_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            # pass the vector through with its ORIGINAL element type
            # (array<float> on the embeddings table): declaring double
            # here would silently up-cast and shift rounded cosines
            StructField(vec_col, corpus.schema[vec_col].dataType, True),
            StructField("cell", LongType(), False),
        ]
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
            yield pd.DataFrame(
                {
                    id_col: ids,
                    vec_col: pdf[vec_col],
                    "cell": cells.astype(np.int64),
                }
            )

    corpus_cells = corpus.select(id_col, vec_col).mapInPandas(
        assign_cells, cell_schema
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
        # zero-norm-safe, same convention as the bruteforce path
        "cosine",
        F.round(_cosine(F.col("qvec"), F.col(vec_col)), 6),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col(id_col).alias("neighbor_id"), "cosine")
    )


def _train_pq_codebooks(
    sample: np.ndarray, m: int, n_centroids: int, iters: int, seed: int
) -> np.ndarray:
    """(m, n_centroids, sub_dim) codebooks via seeded per-subspace Lloyd
    iterations on a driver-side sample — the standard PQ training path
    (train on a bounded sample, encode the corpus distributed)."""
    n, dim = sample.shape
    sub = dim // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, n_centroids, sub))
    for j in range(m):
        x = sample[:, j * sub : (j + 1) * sub]
        cent = x[rng.choice(n, size=min(n_centroids, n), replace=False)]
        if len(cent) < n_centroids:  # tiny sample: pad with jitter
            pad = cent[rng.randint(0, len(cent), n_centroids - len(cent))]
            cent = np.vstack([cent, pad + 1e-6 * rng.randn(*pad.shape)])
        for _ in range(iters):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(n_centroids):
                mask = assign == c
                if mask.any():
                    cent[c] = x[mask].mean(0)
        books[j] = cent
    return books


PQ_TOPK_SCHEMA = StructType(
    [
        StructField("query_id", LongType(), False),
        StructField("neighbor_id", LongType(), False),
        StructField("adc_score", DoubleType(), False),
    ]
)


def pq_topk(
    corpus: DataFrame,
    query_ids: Sequence[int],
    k: int = 5,
    m: int = 8,
    n_centroids: int = 256,
    train_iters: int = 5,
    train_sample: int = 5000,
    seed: int = 13,
    rerank: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN — the MEMORY-bounded scale path: a
    float32 corpus of dim d compresses to m bytes per vector (64x for
    d=64, m=8), so 10^12 embeddings fit where raw floats cannot, at the
    cost of approximate (asymmetric-distance, ADC) scores.

    Vectors are L2-normalized first, so the ADC inner product
    approximates cosine. Stages:
    1. driver: train per-subspace codebooks on a bounded sample
       (``train_sample`` rows, seeded Lloyd) — broadcast (m*256*sub
       doubles, ~128 KB at the defaults).
    2. mapInPandas ENCODE: one distance GEMM per batch per subspace ->
       m uint8 codes per vector; this is the compressed index a real
       deployment persists.
    3. mapInPandas SCORE: per query a (m, 256) LUT of subspace dot
       products, score = LUT gather summed over subspaces (numpy fancy
       indexing, no decompression); per-partition shortlist, then a
       global window keeps k*rerank rows per query. Shuffle = shortlist
       rows per (query, partition) — same shape as cosine_topk_blocked.
    4. exact RE-RANK of the shortlist (``rerank``>0, the production
       shape): tight clusters quantize to identical codes, so ADC order
       within them is tie-noise — a broadcast join fetches the
       shortlist's raw vectors (k*rerank per query, tiny) and exact
       cosine picks the final k.

    Exactness contract: pytest recall gate vs bruteforce (PQ is lossy
    by design — not oracle-able; adc_score stays in the output as the
    shortlist evidence, cosine is exact).
    """
    first = corpus.select(F.size(vec_col).alias("d")).first()
    dim = first["d"] if first else 0
    if dim <= 0:
        raise ValueError("pq_topk needs a non-empty corpus of non-empty vectors")
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    # deterministic training draw (ADVICE r3): a bare limit() without
    # ordering picks whatever partitions answer first, so codebooks —
    # and hence codes/shortlists — depended on the physical layout.
    # Ordering by xxhash64(id) is a layout-independent pseudo-random
    # sample, and Spark executes orderBy+limit as TakeOrderedAndProject
    # (per-partition top-n + driver merge), never a full corpus sort.
    sample_rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(train_sample)
        .toPandas()[vec_col]
        .tolist()
    )
    sample = np.array(sample_rows, dtype=np.float64)
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    books = _train_pq_codebooks(sample / norms, m, n_centroids, train_iters, seed)

    qrows = (
        corpus.filter(F.col(id_col).isin(list(query_ids)))
        .select(id_col, vec_col)
        .collect()
    )
    if not qrows:
        raise ValueError(f"none of query_ids={list(query_ids)} exist in the corpus")
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qv = np.array([r[1] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qv, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    qv = qv / qn

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((books, qids, qv))
    sub = dim // m

    def score(batches):
        import pandas as pd

        books_, qids_, qv_ = bc.value
        # per-query LUT: (nq, m, n_centroids) of subspace dot products
        lut = np.einsum("qjs,jcs->qjc", qv_.reshape(len(qv_), m, sub), books_)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            xn = np.linalg.norm(x, axis=1, keepdims=True)
            xn[xn == 0] = 1.0
            x = x / xn
            ids = pdf[id_col].to_numpy(np.int64)
            # encode: nearest centroid per subspace (||x-c||^2 argmin)
            codes = np.empty((len(x), m), dtype=np.int64)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                d2 = (
                    (xs**2).sum(1)[:, None]
                    - 2 * xs @ books_[j].T
                    + (books_[j] ** 2).sum(1)[None, :]
                )
                codes[:, j] = d2.argmin(1)
            # ADC: gather LUT entries at each vector's codes
            out_q, out_n, out_s = [], [], []
            short = max(k * max(rerank, 1), k)
            for qi in range(len(qids_)):
                s = lut[qi, np.arange(m)[None, :], codes].sum(1)
                mask = ids != qids_[qi]
                cand_ids = ids[mask]
                cand_s = s[mask]
                top = np.argsort(-cand_s)[: min(short, len(cand_s))]
                out_q.extend([int(qids_[qi])] * len(top))
                out_n.extend(int(v) for v in cand_ids[top])
                out_s.extend(round(float(v), 6) for v in cand_s[top])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "adc_score": out_s}
            )

    partial = corpus.select(id_col, vec_col).mapInPandas(score, PQ_TOPK_SCHEMA)
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("adc_score"), F.asc("neighbor_id")
    )
    shortlist = (
        partial.withColumn("_r", F.row_number().over(w_adc))
        .filter(F.col("_r") <= k * max(rerank, 1))
        .drop("_r")
    )
    if rerank <= 0:
        return (
            shortlist.withColumn("rank", F.row_number().over(w_adc).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "adc_score")
        )
    qdf = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(qids, qv)],
        f"query_id long, qvec array<double>",
    )
    refined = (
        # BROADCAST the shortlist (k*rerank*n_queries rows): the raw
        # vectors are fetched as a map-side semi join over the corpus
        # scan, never a corpus shuffle
        F.broadcast(shortlist).join(
            corpus.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
            ),
            "neighbor_id",
        )
        .join(F.broadcast(qdf), "query_id")
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("qvec"), F.col("nvec"))
                / F.when(_norm(F.col("nvec")) > 0, _norm(F.col("nvec"))).otherwise(
                    F.lit(1.0)
                ),
                6,
            ),  # qvec is pre-normalized driver-side
        )
    )
    w_exact = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        refined.withColumn("rank", F.row_number().over(w_exact).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine", "adc_score")
    )
