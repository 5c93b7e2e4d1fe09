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
- SimHash: 64-bit md5-token signatures (portable: the DuckDB oracle can
  recompute them in SQL); COMPLETE combination blocking for any hamming
  budget (generalized Manku multi-table; see simhash_blocking_plan);
  hamming verify on candidates.
- embedding near-dup: OR-amplified multi-table hyperplane LSH + exact
  tiled-GEMM verify per bucket.
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
    metrics: Optional[dict] = None,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard) with word-n-gram Jaccard >= threshold.

    Shuffles: one on shingle (join), one on the pair (agg). Hot shingles
    with document frequency > ``max_shingle_df`` are dropped before the
    join (bounded skew; identical to stop-shingle practice at CC scale).
    No silent caps: pass ``metrics`` to record how many distinct shingles
    (and occurrence rows) the stop-shingle filter removed.
    """
    sh = shingles_df(df, id_col, text_col, n)
    # the shingle subtree feeds three consumers (sizes + both join sides);
    # materialize once instead of recomputing the tokenize/explode tree
    sh = sh.localCheckpoint(eager=False)
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
        )
        if metrics is not None:
            row = hot.agg(
                F.count(F.lit(1)).alias("shingles"), F.sum("df").alias("rows")
            ).first()
            metrics["hot_shingles_dropped"] = int(row["shingles"] or 0)
            metrics["hot_shingle_rows_dropped"] = int(row["rows"] or 0)
        sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
        sh = sh.localCheckpoint(eager=False)
    # sizes are computed over the FILTERED shingle set: with stop-shingle
    # removal, Jaccard is defined on the surviving universe (otherwise the
    # denominator counts shingles that can never appear in `common` and
    # scores are systematically underestimated for docs with hot shingles).
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
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
    """(id, sig array<long>) — universal-hash MinHash over word n-gram
    shingles, computed numpy-side per Arrow batch.

    Shingle hash = first 64 bits of md5(shingle) and permutations are
    ``(a*h + b) mod (2^61-1)`` over exact integers — both reproducible
    in portable SQL (HUGEINT arithmetic), so the driver's DuckDB oracle
    recomputes identical signatures and the LSH query upgrades from a
    rows-only check to a full value-hash oracle. Tokenization is the
    repo-standard ASCII ``\\s+`` split. Docs with fewer than ``n``
    tokens yield no shingles and are EXCLUDED (same convention as
    ngram_jaccard_pairs; exact dedup owns degenerate docs).
    """
    a_params, b_params = _perm_params(num_perm, seed)
    schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("sig", ArrayType(LongType(), False), False),
        ]
    )

    def compute(batches):
        import re

        import pandas as pd

        from ..functions.hashing import md5_u64_py

        a = a_params.astype(object)  # python ints: exact 125-bit products
        b = b_params.astype(object)
        ws = re.compile(r"\s+", re.ASCII)
        memo: dict = {}

        def sh_hash(s: str) -> int:
            h = memo.get(s)
            if h is None:
                h = md5_u64_py(s)
                memo[s] = h
            return h

        for pdf in batches:
            ids, sigs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = [
                    t
                    for t in ws.split(str(text).lower() if text is not None else "")
                    if t
                ]
                if len(toks) < n:
                    continue
                sh = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
                hv = np.array([sh_hash(s) for s in sh], dtype=object)
                # (a*h + b) mod p, per permutation — outer product
                m = (hv[None, :] * a[:, None] + b[:, None]) % _MERSENNE
                sigs.append([int(x) for x in m.min(axis=1)])
                ids.append(int(doc_id))
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "sig": pd.Series(sigs, dtype="object"),
                }
            )

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
    # band key = md5 of the comma-joined minhash values: PORTABLE, so the
    # DuckDB oracle reproduces the exact same candidate set (string_agg
    # over p_idx + md5) — banding recall is then structural for the
    # oracle, not an empirical coincidence of the fixture
    band_cols = [
        F.md5(F.concat_ws(",", *[F.col("sig")[b * rows + r].cast("string") for r in range(rows)])).alias("band_hash")
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
    """64-bit SimHash over word tokens (vectorized numpy bit-vote).

    Token hash = first 64 bits of md5(token): md5 is available verbatim
    in every SQL engine, so the whole signature (tokenize -> md5 -> per-bit
    vote -> sign) is reproducible as portable SQL — the driver's DuckDB
    oracle recomputes identical signatures, upgrading simhash dedup from a
    rows-only check to a full value-hash oracle. Tokenization is the
    repo-standard ASCII ``\\s+`` split (parity with RE2 ``\\s`` in DuckDB;
    python ``str.split()`` would diverge on U+00A0 etc.). Docs with zero
    tokens are excluded (no meaningful near-dup signature; exact dedup
    owns the empty-text class).
    """
    schema = StructType([StructField("id", LongType(), False), StructField("simhash", LongType(), False)])

    def compute(batches):
        import re

        import pandas as pd

        from ..functions.hashing import md5_u64_py

        ws = re.compile(r"\s+", re.ASCII)
        memo: dict = {}  # tokens repeat heavily; one md5 per distinct token

        def tok_hash(t: str) -> int:
            h = memo.get(t)
            if h is None:
                h = md5_u64_py(t)
                memo[t] = h
            return h

        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in ws.split(str(text).lower() if text is not None else "") if t]
                if not toks:
                    continue
                hv = np.array([tok_hash(t) for t in toks], dtype=np.uint64)
                bits = ((hv[:, None] >> bit_idx[None, :]) & 1).astype(np.int32)
                votes = bits.sum(axis=0) * 2 - len(toks)
                sig = int(((votes > 0).astype(np.uint64) << bit_idx).sum())
                hashes.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
                ids.append(int(doc_id))
            yield pd.DataFrame({"id": pd.Series(ids, dtype="int64"), "simhash": pd.Series(hashes, dtype="int64")})

    return df.select(id_col, text_col).mapInPandas(compute, schema)


def _n_choose_k(m: int, c: int) -> int:
    from math import comb

    return comb(m, c)


def simhash_blocking_plan(max_hamming: int, max_keys: int = 128):
    """(n_chunks, combinations) for COMPLETE simhash blocking.

    Split 64 bits into ``m`` chunks and key each doc on every combination
    of ``c = m - max_hamming`` chunks: a pair within hamming ``k`` has
    differing bits in at most ``k`` chunks, so at least ``m - k`` chunks
    agree, and one full combination of ``m - k`` chunks is shared — no
    false negatives (generalized Manku multi-table blocking). Larger ``c``
    means wider, more selective keys at the cost of C(m, c) keys per doc;
    we pick the widest key with fan-out <= ``max_keys``.
    """
    from itertools import combinations

    k = max_hamming
    m = k + 1
    for cand_m in range(min(k + 4, 32), k, -1):
        if _n_choose_k(cand_m, cand_m - k) <= max_keys:
            m = cand_m
            break
    if _n_choose_k(m, m - k) > max_keys:
        # even the minimal complete plan (k+1 single-chunk keys) exceeds
        # the cap: refuse rather than silently violate either the
        # fan-out contract or completeness
        raise ValueError(
            f"max_keys={max_keys} cannot cover max_hamming={k}: "
            f"completeness needs at least {k + 1} keys per doc"
        )
    return m, list(combinations(range(m), m - k))


def _simhash_keys(sigs: DataFrame, m: int, combos) -> DataFrame:
    """(id, simhash, key) rows — one key per blocking combination, mixed
    in vectorized numpy (splitmix-style fold over the combo's chunk
    values).

    This deliberately does NOT build the keys as JVM expressions: an
    exploded array of C(m, c) xxhash64 trees (1820 at the wide plan,
    each over c shift/mask subtrees) is a megabyte-scale codegen unit
    that the optimizer additionally clones into BOTH sides of the
    candidate self-join — the repo-wide Janino pathology (the r3 bench
    measured 80 s of compile time for the 200-doc fixture). Key mixing
    is job-internal (the oracle checks final hamming semantics, not
    keys), so a numpy fold is both safe and ~free; a rare 64-bit mix
    collision only adds a candidate that exact verification discards."""
    widths = [(64 // m) + (1 if i < 64 % m else 0) for i in range(m)]
    starts = [sum(widths[:i]) for i in range(m)]
    key_schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("simhash", LongType(), False),
            StructField("key", LongType(), False),
        ]
    )
    n_combos = len(combos)
    PRIME = np.uint64(0x9E3779B97F4A7C15)

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            sh_i64 = np.ascontiguousarray(pdf["simhash"].to_numpy(np.int64))
            ids = pdf["id"].to_numpy(np.int64)
            sh = sh_i64.view(np.uint64)
            chunks = [
                (sh >> np.uint64(starts[i])) & np.uint64((1 << widths[i]) - 1)
                for i in range(m)
            ]
            # bound each emitted frame to ~2M rows regardless of fan-out
            group = max(1, 2_000_000 // n)
            for g0 in range(0, n_combos, group):
                cs = combos[g0 : g0 + group]
                keys = np.empty((len(cs), n), dtype=np.uint64)
                for row, combo in enumerate(cs):
                    h = np.full(n, np.uint64(g0 + row + 1) * PRIME, dtype=np.uint64)
                    for i in combo:
                        h = (h ^ chunks[i]) * PRIME
                        h ^= h >> np.uint64(31)
                    keys[row] = h
                yield pd.DataFrame(
                    {
                        "id": np.tile(ids, len(cs)),
                        "simhash": np.tile(sh_i64, len(cs)),
                        "key": keys.reshape(-1).view(np.int64),
                    }
                )

    return sigs.mapInPandas(gen, key_schema)


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_keys: int = 128,
    metrics: Optional[dict] = None,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Blocking is COMPLETE for the requested ``max_hamming`` (see
    simhash_blocking_plan): the old fixed 4x16-bit chunking guaranteed
    recall only for hamming <= 3 by pigeonhole, silently dropping
    wider pairs. Candidate keys are mixed vectorized in the signature's
    numpy stage (see _simhash_keys for why not JVM expressions) — one
    shuffle on key, hamming-verified JVM-side
    with bit_count(xor). At max_hamming=3 the plan picks m=7 chunks and
    C(7,4)=35 keys of 4 chunks (~36 bits) — denser than Manku's classic
    20-table m=6 design but with wider (more selective) keys; at 12 it
    is 91 keys of 2 chunks (~9 bits) — still never all-pairs, but see
    ``max_keys`` below for the bucket-population tradeoff at wide h.

    ``max_keys`` IS the scale knob for wide hamming: effective key width
    is ~64*(m-k)/m bits and the candidate self-join per bucket is
    ~(N/2^width)^2, so at k=12 the default 128-key budget (9-bit keys,
    N/512 docs per bucket) goes quadratic on a billion-doc corpus —
    raise it (2048 buys 1820 keys of ~16 bits) and pay fan-out instead
    of bucket population. Pass ``metrics`` (dict) to record the chosen
    plan plus measured bucket populations and candidate-pair count.
    """
    m, combos = simhash_blocking_plan(max_hamming, max_keys)
    if metrics is not None:
        metrics["n_chunks"] = m
        metrics["n_keys"] = len(combos)
        metrics["key_bits"] = round(64 * (m - max_hamming) / m, 1)
    sigs = simhash_signatures(df, id_col, text_col).localCheckpoint(eager=False)
    keys = _simhash_keys(sigs, m, combos)
    if metrics is not None:
        # bucket-population / candidate-growth metrics (extra aggregate
        # over the key rows; only when asked for — no silent caps, no
        # silent quadratics either)
        pop = keys.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
        stats = pop.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("n").alias("max_bucket"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("cand_pairs"),
        ).first()
        metrics["n_buckets"] = int(stats["n_buckets"] or 0)
        metrics["max_bucket"] = int(stats["max_bucket"] or 0)
        metrics["candidate_pairs"] = int(stats["cand_pairs"] or 0)
    cand = (
        keys.alias("x")
        .join(
            keys.alias("y"),
            (F.col("x.key") == F.col("y.key")) & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.simhash").alias("h_a"),
            F.col("y.simhash").alias("h_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("long")
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
    block_planes: Optional[int] = None,
    n_tables: int = 12,
    seed: int = 42,
    max_bucket_block: int = 4096,
    metrics: Optional[dict] = None,
) -> DataFrame:
    """Pairs with cosine >= threshold (OR-amplified hyperplane LSH).

    Blocking: ``n_tables`` INDEPENDENT random-hyperplane sign signatures
    of ``block_planes`` bits each. A single signature misses most true
    pairs (P[collide] = (1 - theta/pi)^planes ~ 43% at cos 0.95 with 8
    planes); OR-amplification across R tables lifts recall to
    1 - (1 - p)^R (>= 99.8% for the same setting at R=12). Pairs found
    in several tables are deduplicated after verification.

    ``block_planes=None`` (default) derives the bucket-count from the
    corpus: planes = ceil(log2(n / max_bucket_block)), so the EXPECTED
    bucket holds ~max_bucket_block vectors regardless of corpus size —
    a fixed plane count that is right at 10^6 rows is 2^10 x too coarse
    at 10^9. Pass an explicit value to pin the recall/cost tradeoff.

    Two numpy stages:
    1. mapInPandas: one GEMM of the batch against the broadcast
       (R*planes, dim) plane matrix -> R bucket ids per vector (emitted
       as R rows); each vector normalized once (cosine later = plain
       dot). (A previous formulation built the signature as literal
       zip_with/aggregate expressions; the optimizer cloned that tree
       into both self-join sides — the dedup-wide Janino pathology.)
    2. hot-bucket tiling, then shuffle on (table, bucket, tile): bucket
       sizes are counted (bucket-universe-sized aggregate, broadcast
       back), each bucket splits into ceil(n/max_bucket_block) blocks,
       and every block PAIR (bi <= bj) becomes its own task — so no
       single task ever materializes a hot bucket in one pandas frame
       (the pre-round-3 design held the whole bucket per task and only
       tiled the GEMM, an OOM on any skewed bucket). applyInPandas per
       tile: blocked GEMM, emit pairs >= threshold. Verification is
       exact, so extra candidates from OR-ing never cause false
       positives.
    3. distinct() on the verified pairs (cosines are rounded
       identically in every table, so cross-table and cross-tile
       duplicates collapse).

    ``metrics`` (optional dict) records bucket populations — n_buckets,
    max_bucket_rows, n_tiles, tiled_buckets — the no-silent-caps
    contract the jaccard/canonicalize operators follow.
    """
    if block_planes is None:
        # dim + count in ONE scan of the input lineage (a separate
        # count() would replay potentially-expensive upstream work)
        stats = df.agg(
            F.count(F.lit(1)).alias("n"), F.max(F.size(vec_col)).alias("d")
        ).first()
        n_rows, dim = int(stats["n"] or 0), int(stats["d"] or 0)
        block_planes = max(
            1, int(np.ceil(np.log2(max(n_rows, 2) / max(max_bucket_block, 1))))
        ) if n_rows > max_bucket_block else 1
        block_planes = min(block_planes, 30)
    else:
        first = df.select(F.size(vec_col).alias("d")).first()
        dim = first["d"] if first else 0
    if metrics is not None:
        metrics["block_planes"] = block_planes
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_tables * block_planes, dim)
    weights = (2 ** np.arange(block_planes)).astype(np.int64)

    sig_schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("table", LongType(), False),
            StructField("bucket", LongType(), False),
            StructField("unit", ArrayType(DoubleType(), False), False),
        ]
    )

    def signatures(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            n = len(x)
            signs = (x @ planes.T >= 0).astype(np.int64)  # (n, R*planes)
            # (n, R): bucket id per table
            buckets = signs.reshape(n, n_tables, block_planes) @ weights
            norms = np.linalg.norm(x, axis=1)
            norms[norms == 0] = 1.0  # zero vectors stay zero after divide
            unit = x / norms[:, None]
            ids = pdf[id_col].astype("int64").to_numpy()
            yield pd.DataFrame(
                {
                    "id": np.repeat(ids, n_tables),
                    "table": np.tile(np.arange(n_tables, dtype=np.int64), n),
                    "bucket": buckets.reshape(-1),
                    "unit": [u for u in unit for _ in range(n_tables)],
                }
            )

    out_schema = StructType(
        [
            StructField("id_a", LongType(), False),
            StructField("id_b", LongType(), False),
            StructField("cosine", DoubleType(), False),
        ]
    )

    sig = df.select(id_col, vec_col).mapInPandas(signatures, sig_schema)
    tiles = _bucket_tiles(sig, max_bucket_block, metrics=metrics)
    return (
        tiles.groupBy("table", "bucket", "ti", "tj")
        .applyInPandas(
            lambda pdf: _verify_tile(pdf, threshold, max_bucket_block), out_schema
        )
        .distinct()
    )


def _bucket_tiles(
    sig: DataFrame, max_bucket_block: int, metrics: Optional[dict] = None
) -> DataFrame:
    """Split each (table, bucket) into hash blocks of ~max_bucket_block
    rows and fan every row out to its block-pair tiles: a row in block b
    of a bucket with nb blocks lands in tiles (b, j>=b) as the A side
    and (i<b, b) as the B side, so tile (i, j) holds exactly blocks i
    and j and every within-bucket pair appears in exactly one tile. The
    per-tile row count is bounded by ~2*max_bucket_block — a hot bucket
    costs more TASKS, never more task MEMORY. Fan-out per row is nb
    tiles (= the unavoidable O(n^2/block^2) tile count of the verify)."""
    counts = sig.groupBy("table", "bucket").agg(F.count(F.lit(1)).alias("_n"))
    if metrics is not None:
        nb = F.ceil(F.col("_n") / max_bucket_block)
        stats = counts.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("_n").alias("max_bucket_rows"),
            F.sum(nb * (nb + 1) / 2).alias("n_tiles"),  # C(nb,2)+nb per bucket
            F.sum(
                (F.col("_n") > max_bucket_block).cast("long")
            ).alias("tiled_buckets"),
        ).first()
        metrics["n_buckets"] = int(stats["n_buckets"] or 0)
        metrics["max_bucket_rows"] = int(stats["max_bucket_rows"] or 0)
        metrics["n_tiles"] = int(stats["n_tiles"] or 0)
        metrics["tiled_buckets"] = int(stats["tiled_buckets"] or 0)
    tagged = (
        sig.join(F.broadcast(counts), ["table", "bucket"])
        .withColumn(
            "nb", F.ceil(F.col("_n") / F.lit(max_bucket_block)).cast("int")
        )
        .withColumn("bi", F.pmod(F.xxhash64("id"), F.col("nb")).cast("int"))
    )
    tile_t = "array<struct<ti:int,tj:int,side:int>>"
    a_side = F.transform(
        F.sequence(F.col("bi"), F.col("nb") - 1),
        lambda j: F.struct(
            F.col("bi").alias("ti"), j.alias("tj"), F.lit(0).alias("side")
        ),
    )
    b_side = F.when(
        F.col("bi") > 0,
        F.transform(
            F.sequence(F.lit(0), F.col("bi") - 1),
            lambda i: F.struct(
                i.alias("ti"), F.col("bi").alias("tj"), F.lit(1).alias("side")
            ),
        ),
    ).otherwise(F.expr(f"CAST(array() AS {tile_t})"))
    return tagged.select(
        "id",
        "unit",
        "table",
        "bucket",
        F.explode(F.concat(a_side, b_side)).alias("_t"),
    ).select(
        "id",
        "unit",
        "table",
        "bucket",
        F.col("_t.ti").alias("ti"),
        F.col("_t.tj").alias("tj"),
        F.col("_t.side").alias("side"),
    )


def _verify_tile(
    pdf: "pd.DataFrame", threshold: float, max_bucket_block: int
) -> "pd.DataFrame":
    """Exact cosine verification of one tile: diagonal tiles (side-0 rows
    only) emit the upper triangle of their block; off-diagonal tiles
    emit every (A-side, B-side) pair >= threshold. Blocked GEMM keeps
    the working set bounded even if hash blocks run oversized."""
    empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
        {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
    )
    a = pdf[pdf["side"] == 0]
    b = pdf[pdf["side"] == 1]
    ia, ib, cs = [], [], []
    step = max_bucket_block

    def emit(ids_r, ids_c, sims, upper_from=None):
        # vectorized pair selection (optimization r9, guide §4.2): the
        # old per-pair Python loop appended millions of rows one by one
        # on dense buckets; masks + fancy indexing do the selection in
        # numpy. The EMITTED cosine stays Python round(float(x), 6) —
        # bit-identical to the previous loop (np.round's scale-and-rint
        # can differ in the last ulp from correct decimal rounding, and
        # the emitted value is hash-checked by the oracle).
        # cheap >= pre-mask first: np.round over the FULL sims matrix
        # was 3 vectorized passes (mul, rint, div) per tile — the
        # dominant cost at dense buckets. Rounding can only promote a
        # value by < 1e-6, so x >= threshold - 1e-6 is a superset of
        # np.round(x, 6) >= threshold; the exact rounded test then runs
        # only on the surviving candidates.
        rr, cc = np.nonzero(sims >= threshold - 1e-6)
        if len(rr):
            keep = np.round(sims[rr, cc], 6) >= threshold
            rr, cc = rr[keep], cc[keep]
        if upper_from is not None:
            keep = (upper_from[0] + rr) < (upper_from[1] + cc)
            rr, cc = rr[keep], cc[keep]
        av, bv = ids_r[rr], ids_c[cc]
        keep = av != bv
        av, bv, rr, cc = av[keep], bv[keep], rr[keep], cc[keep]
        ia.append(np.minimum(av, bv))
        ib.append(np.maximum(av, bv))
        cs.append([round(float(v), 6) for v in sims[rr, cc]])

    def frame():
        if not ia:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.concatenate(ia),
                "id_b": np.concatenate(ib),
                "cosine": np.fromiter(
                    (v for chunk in cs for v in chunk), np.float64
                ),
            }
        )

    if len(b) == 0:  # diagonal tile: upper triangle within A
        n = len(a)
        if n < 2:
            return empty
        ids = a["id"].to_numpy()
        u = np.array(a["unit"].tolist(), dtype=np.float64)
        for r0 in range(0, n, step):
            r1 = min(r0 + step, n)
            for c0 in range(r0, n, step):
                c1 = min(c0 + step, n)
                emit(ids[r0:r1], ids[c0:c1], u[r0:r1] @ u[c0:c1].T,
                     upper_from=(r0, c0))
        return frame()
    if len(a) == 0:
        return empty
    ids_a = a["id"].to_numpy()
    ids_b = b["id"].to_numpy()
    ua = np.array(a["unit"].tolist(), dtype=np.float64)
    ub = np.array(b["unit"].tolist(), dtype=np.float64)
    for r0 in range(0, len(a), step):
        r1 = min(r0 + step, len(a))
        for c0 in range(0, len(b), step):
            c1 = min(c0 + step, len(b))
            emit(ids_a[r0:r1], ids_b[c0:c1], ua[r0:r1] @ ub[c0:c1].T)
    return frame()


# ------------------------------------------------------------ clusters --


def dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    driver_max_graph: int = 2_000_000,
    metrics: Optional[dict] = None,
) -> DataFrame:
    """Turn near-dup PAIRS into KEEP/DROP decisions: transitive closure
    of the pair graph (connected components), canonical id = min doc id
    per component, ``keep`` = 1 iff the doc is its component's
    representative. This is the step every dedup pipeline needs after
    candidate verification — pairs alone don't say which doc survives,
    and naive "drop the right side of every pair" over-deletes when
    clusters overlap (a<b, b<c would drop b AND c but keep nothing
    linking c to a without the closure).

    Scale posture: the pair graph at corpus scale is SPARSE (near-dup
    clusters are small and bounded by the upstream banding caps), so
    the adaptive CC reuses canonicalize.connected_components — driver
    union-find below ``driver_max_graph`` nodes+edges, hash-to-min
    label propagation (one shuffle per round, O(cluster diameter)
    rounds — dup-cluster diameters are tiny) above it. Node ids keep
    their input type (bigint in, bigint out) on both paths.
    """
    from .canonicalize import connected_components

    nodes = docs.select(F.col(id_col)).distinct().localCheckpoint(eager=True)
    cc = connected_components(
        pairs,
        nodes,
        node_col=id_col,
        src_col=src_col,
        dst_col=dst_col,
        driver_max_graph=driver_max_graph,
        metrics=metrics,
        assume_distinct_nodes=True,
    )
    return cc.select(
        F.col(id_col),
        F.col("component").alias("canonical_id"),
        (F.col(id_col) == F.col("component")).cast("int").alias("keep"),
    )


# --------------------------------------------------------- incremental --


def incremental_new_docs(
    new_batch: DataFrame,
    history: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    history_digest_col: Optional[str] = None,
) -> DataFrame:
    """Ingest-time dedup for a continuously-crawled corpus: from a new
    batch, keep only docs whose content digest is (a) unseen in the
    historical corpus and (b) first within the batch (min id per
    digest). Returns (id, digest) of the accepted docs — the rows a
    crawl-ingestion job appends to the corpus and to the digest index.

    ``history`` is either the raw corpus (``text_col`` is hashed per
    run — fine for tests and backfills) or, for daily production runs,
    the persisted digest INDEX itself: pass ``history_digest_col`` and
    the history side is consumed as one md5 per historical doc with no
    rehash of corpus text. The accepted rows' ``digest`` column is
    exactly what gets appended to that index, closing the loop.

    Scale posture: the history side at 100 TB is the digest index, not
    the corpus — rehashing history text daily would make every ingest
    O(corpus); the index join is O(index). The join strategy is
    deliberately left to Catalyst's stats: a small index broadcasts
    (fixture scale — plan-pinned), a crawl-scale index flips the SAME
    declarative plan to a hash-shuffle anti join where each reducer
    holds one digest range; nothing is collected either way. The
    within-batch winnow is a window over the same digest key, so under
    the shuffle strategy it rides the join's partitioning. With a
    bucketed/Z-ordered digest index the history shuffle amortizes to
    zero across daily runs.
    """
    if history_digest_col is not None:
        hist_digests = history.select(
            F.col(history_digest_col).alias("digest")
        ).distinct()
    else:
        hist_digests = history.select(
            F.md5(F.col(text_col)).alias("digest")
        ).distinct()
    batch = new_batch.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("digest")
    )
    fresh = batch.join(hist_digests, "digest", "left_anti")
    w = Window.partitionBy("digest").orderBy(F.col(id_col))
    return (
        fresh.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "digest")
    )
