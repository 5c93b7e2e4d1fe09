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
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

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
) -> DataFrame:
    """Pairs with cosine >= threshold.

    Blocking: random-hyperplane sign signature (``block_planes`` bits);
    near-identical vectors land in the same bucket with high probability.
    Verification: exact cosine via zip_with/aggregate (JVM-side).
    """
    first = df.select(F.size(vec_col).alias("d")).first()
    dim = first["d"] if first else 0
    rng = np.random.RandomState(seed)
    planes = rng.randn(block_planes, dim)
    plane_cols = [
        F.when(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in planes[p]]),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for p in range(block_planes)
    ]
    sig = sum(
        (c * (2 ** i) for i, c in enumerate(plane_cols)), F.lit(0)
    )
    with_sig = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), sig.alias("bucket")
    )
    a = with_sig.alias("a")
    b = with_sig.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.vec"), F.col("b.vec"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def norm(side):
        return F.sqrt(
            F.aggregate(
                F.transform(F.col(f"{side}.vec"), lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )

    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .withColumn("cosine", F.round(dot / (norm("a") * norm("b")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine")
    )
