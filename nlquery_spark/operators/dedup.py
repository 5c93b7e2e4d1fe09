"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale posture:
- exact/fingerprint dedup: one hash-shuffle on the digest (map-side
  partial agg free via Catalyst).
- n-gram Jaccard: shingle explode + self-join on shingle. Quadratic in
  per-shingle document frequency — hot shingles are capped
  (``max_shingle_df``) exactly like stop-shingle filtering in production
  dedup pipelines; AQE skew-join covers residual skew.
- MinHash/LSH: signature computation is a vectorized numpy pandas-UDF
  (Arrow batches); candidate generation explodes band buckets and
  self-joins per bucket — linear in bucket sizes, never all-pairs.
- SimHash: 64-bit signatures, banded into 4x16-bit chunks for blocking;
  hamming verify on candidates.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------- exact --


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: digest -> canonical (min) id + ids."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id representative per identical text."""
    w = F.row_number().over(
        Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    )
    return df.withColumn("_rn", w).filter(F.col("_rn") == 1).drop("_rn")


# ------------------------------------------------------- n-gram Jaccard --


def shingles_df(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle).

    Shingling runs in an Arrow-batched pandas UDF rather than nested
    built-in higher-order functions: the HOF formulation
    (transform(sequence(...), slice(...)) under array_distinct) gets
    cloned by the optimizer into the generate pre-filter and the scan
    residual, and the resulting multi-copy expression blows Janino
    codegen — measured ~5s of per-query recompilation plus interpreted
    (non-codegen) evaluation, ~10x slower steady-state than this UDF.
    The explode stays JVM-side so downstream joins see plain rows.
    """

    @F.pandas_udf(ArrayType(StringType()))
    def _shingles(texts: pd.Series) -> pd.Series:
        import re

        # ASCII \s+, space-only trim: exact parity with the JVM
        # split(trim(text), '\s+') this replaces and with the DuckDB
        # oracle's string_split_regex(trim(text), '\s+') — python
        # str.split() would also break on \xa0 etc. and diverge.
        ws = re.compile(r"\s+", re.ASCII)
        out = []
        for t in texts:
            t = t.strip(" ") if isinstance(t, str) else ""
            w = ws.split(t) if t else []
            if len(w) < n:
                out.append([])
                continue
            w = [x.lower() for x in w]
            # dict.fromkeys: distinct, first-occurrence order
            out.append(
                list(dict.fromkeys(" ".join(w[i : i + n]) for i in range(len(w) - n + 1)))
            )
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias("id"), F.explode(_shingles(F.col(text_col))).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: Optional[int] = 1000,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard) with word-n-gram Jaccard >= threshold.

    Shuffles: one on shingle (join), one on the pair (agg). Hot shingles
    with document frequency > ``max_shingle_df`` are dropped before the
    join (bounded skew; identical to stop-shingle practice at CC scale).
    """
    sh = shingles_df(df, id_col, text_col, n)
    # the shingle subtree feeds three consumers (sizes + both join sides);
    # materialize once instead of recomputing the tokenize/explode tree
    sh = sh.localCheckpoint(eager=False)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------- MinHash LSH --

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<long>) — vectorized universal-hash MinHash over
    word n-gram shingles, computed numpy-side per Arrow batch."""
    a_params, b_params = _perm_params(num_perm, seed)
    schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("sig", ArrayType(LongType(), False), False),
        ]
    )

    def compute(batches):
        import pandas as pd
        import zlib

        a = a_params.astype(object)  # python ints: avoid int64 overflow
        b = b_params.astype(object)

        for pdf in batches:
            ids, sigs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = str(text).lower().split()
                if len(toks) < n:
                    sh = {" ".join(toks)} if toks else set()
                else:
                    sh = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
                if not sh:
                    ids.append(int(doc_id))
                    sigs.append([int(_MERSENNE)] * len(a))
                    continue
                hv = np.array(
                    [zlib.crc32(s.encode()) for s in sh], dtype=np.int64
                )
                # (a*x + b) mod p, per permutation — outer product
                m = (hv[None, :].astype(object) * a[:, None] + b[:, None]) % _MERSENNE
                sigs.append([int(x) for x in m.min(axis=1)])
                ids.append(int(doc_id))
            yield pd.DataFrame({"id": ids, "sig": sigs})

    return df.select(id_col, text_col).mapInPandas(compute, schema)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH, verified by
    estimated Jaccard (fraction of agreeing minhashes) >= threshold."""
    rows = num_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_perm, seed).cache()
    band_cols = [
        F.hash(F.concat_ws(",", *[F.col("sig")[b * rows + r].cast("string") for r in range(rows)])).alias("band_hash")
        for b in range(bands)
    ]
    buckets = sigs.select(
        "id",
        F.posexplode(F.array(*band_cols)).alias("band", "bucket"),
    )
    cand = (
        buckets.alias("x")
        .join(
            buckets.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    sa = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    ).cast("double") / F.lit(num_perm)
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# -------------------------------------------------------------- SimHash --


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over word tokens (vectorized numpy bit-count)."""
    schema = StructType([StructField("id", LongType(), False), StructField("simhash", LongType(), False)])

    def compute(batches):
        import pandas as pd
        import zlib

        def mix64(x: np.ndarray) -> np.ndarray:
            # splitmix64 finalizer: crc32 is linear, so correlated tokens
            # (shared prefixes) would otherwise yield degenerate vote
            # margins; this decorrelates the per-token bit patterns.
            with np.errstate(over="ignore"):
                x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
                x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
                x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
                return x ^ (x >> np.uint64(31))

        for pdf in batches:
            ids, hashes = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = str(text).lower().split()
                ids.append(int(doc_id))
                if not toks:
                    hashes.append(0)
                    continue
                hv = mix64(
                    np.array(
                        [
                            (zlib.crc32(t.encode()) << 32)
                            | zlib.crc32((t + "#").encode())
                            for t in toks
                        ],
                        dtype=np.uint64,
                    )
                )
                bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                    np.int32
                )
                votes = bits.sum(axis=0) * 2 - len(toks)
                sig = int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
                hashes.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
            yield pd.DataFrame({"id": ids, "simhash": hashes})

    return df.select(id_col, text_col).mapInPandas(compute, schema)


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming, blocked on
    4x16-bit chunks (a pair within distance 3 must agree on >=1 chunk)."""
    sigs = simhash_signatures(df, id_col, text_col).cache()
    chunks = sigs.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), b * 16)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias(f"c{b}")
                    for b in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    cand = (
        chunks.alias("x")
        .join(
            chunks.alias("y"),
            (F.col("x.chunk_idx") == F.col("y.chunk_idx"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.simhash").alias("h_a"),
            F.col("y.simhash").alias("h_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ------------------------------------------- embedding cosine near-dup --


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_planes: int = 8,
    seed: int = 42,
    max_bucket_block: int = 4096,
) -> DataFrame:
    """Pairs with cosine >= threshold.

    Blocking: random-hyperplane sign signature (``block_planes`` bits);
    near-identical vectors land in the same bucket with high probability.
    Two numpy stages, one shuffle:
    1. mapInPandas: GEMM the batch against the broadcast plane matrix ->
       bucket id; normalize each vector once (cosine later = plain dot).
       (A previous formulation built the 8-plane signature as literal
       zip_with/aggregate expressions; the optimizer cloned that tree
       into both self-join sides — the dedup-wide Janino pathology — and
       norms were recomputed per candidate PAIR.)
    2. shuffle on bucket; applyInPandas per bucket: blocked GEMM over the
       normalized vectors, emit upper-triangle pairs >= threshold.
       ``max_bucket_block`` bounds per-GEMM memory on hot buckets (the
       skew guard): verification runs in block x block tiles, exact.
    """
    first = df.select(F.size(vec_col).alias("d")).first()
    dim = first["d"] if first else 0
    rng = np.random.RandomState(seed)
    planes = rng.randn(block_planes, dim)
    weights = (2 ** np.arange(block_planes)).astype(np.int64)

    sig_schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("bucket", LongType(), False),
            StructField("unit", ArrayType(DoubleType(), False), False),
        ]
    )

    def signatures(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            signs = (x @ planes.T >= 0).astype(np.int64)
            buckets = signs @ weights
            norms = np.linalg.norm(x, axis=1)
            norms[norms == 0] = 1.0  # zero vectors stay zero after divide
            unit = x / norms[:, None]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "bucket": buckets,
                    "unit": list(unit),
                }
            )

    out_schema = StructType(
        [
            StructField("id_a", LongType(), False),
            StructField("id_b", LongType(), False),
            StructField("cosine", DoubleType(), False),
        ]
    )

    def verify_bucket(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        ids = pdf["id"].to_numpy()
        u = np.array(pdf["unit"].tolist(), dtype=np.float64)
        ia, ib, cs = [], [], []
        step = max_bucket_block
        for r0 in range(0, n, step):
            r1 = min(r0 + step, n)
            for c0 in range(r0, n, step):
                c1 = min(c0 + step, n)
                sims = u[r0:r1] @ u[c0:c1].T
                rr, cc = np.nonzero(np.round(sims, 6) >= threshold)
                for r, c in zip(rr, cc):
                    gi, gj = r0 + r, c0 + c
                    if gi < gj:
                        a_id, b_id = ids[gi], ids[gj]
                        if a_id > b_id:
                            a_id, b_id = b_id, a_id
                        ia.append(a_id)
                        ib.append(b_id)
                        cs.append(round(float(sims[r, c]), 6))
        return pd.DataFrame({"id_a": ia, "id_b": ib, "cosine": cs})

    sig = df.select(id_col, vec_col).mapInPandas(signatures, sig_schema)
    return sig.groupBy("bucket").applyInPandas(
        lambda pdf: verify_bucket(pdf), out_schema
    )
