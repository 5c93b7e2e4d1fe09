"""Corpus-preparation operators for LLM training-data pipelines:
repetition analysis, PII scrubbing, deterministic stratified sampling,
and sequence packing.

Everything except packing is pure built-in ``pyspark.sql.functions``
(JVM, whole-stage codegen) with an exact DuckDB oracle; packing is
inherently sequential per bin, so it runs as deterministic per-group
greedy first-fit-decreasing inside ``applyInPandas`` and is pinned by
exact pytest invariants instead of SQL.

Scale posture:
- repetition_stats: MAP-ONLY since r9 — the per-doc top-bigram count is
  the longest equal-run in the sorted per-row bigram array (sort_array
  + aggregate in codegen), so no shuffle at all; per-row cost is
  O(len log len) in document length (cap extreme docs upstream via
  corpus_clean's length gate).
- pii_scrub: stateless projection; pushdown/pruning unaffected.
- stratified_sample: stateless filter on an md5-derived uniform; no
  shuffle, no RNG state, reproducible across engines AND cluster
  topologies (the reason to avoid rand(): Spark's sample() is
  partition-dependent, so a repartition changes the sample).
- pack_documents: packing parallelism = number of pack groups; each
  group packs its own docs greedily. Groups are formed by an explicit
  deterministic key (doc_id % n_groups), so output is stable across
  cluster sizes; bin ids are group-prefixed, so no cross-group
  coordination exists.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.text import tokens as tokens_col

# ------------------------------------------------------- repetition --


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-token
    fraction and the most-repeated adjacent bigram's share of all
    bigrams (high values flag boilerplate/spam for corpus filtering).

    (doc_id, n_tokens, dup_token_frac, top_bigram_n, top_bigram_frac).
    """
    toks = F.transform(tokens_col(F.col(text_col)), F.lower)
    base = docs.select(
        "doc_id",
        toks.alias("_toks"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("_n_distinct"),
    )
    # MAP-ONLY top-bigram count (optimization r9, guide §2.4): the
    # most-repeated adjacent bigram's count per doc equals the longest
    # run of equal values in the doc's SORTED bigram array — computable
    # per row with sort_array + aggregate in codegen. The previous shape
    # exploded every bigram of the corpus into rows, shuffled them
    # twice ((doc, bigram) count, then per-doc max) and joined the
    # result back onto the doc relation; all three exchanges are gone.
    bg = F.transform(
        F.sequence(F.lit(0), F.size("_toks") - 2),
        lambda i: F.concat_ws(" ", F.get("_toks", i), F.get("_toks", i + 1)),
    )
    best_run = F.aggregate(
        F.sort_array(bg),
        # '' can never equal a real bigram (tokens are non-empty, so a
        # bigram always contains a space-joined non-empty pair)
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    base = base.withColumn(
        "top_bigram_n",
        F.when(F.col("n_tokens") > 1, best_run).otherwise(F.lit(0)),
    )
    dup_frac = F.when(
        F.col("n_tokens") > 0,
        F.round(
            1.0 - F.col("_n_distinct").cast("double") / F.col("n_tokens"), 6
        ),
    ).otherwise(F.lit(0.0))
    top_frac = F.when(
        F.col("n_tokens") > 1,
        F.round(
            F.coalesce(F.col("top_bigram_n"), F.lit(0)).cast("double")
            / (F.col("n_tokens") - 1),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return base.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        dup_frac.alias("dup_token_frac"),
        F.col("top_bigram_n").cast("long").alias("top_bigram_n"),
        top_frac.alias("top_bigram_frac"),
    )


# -------------------------------------------------------- PII scrub --

# conservative, lookahead-free patterns that parse identically under
# Java regex (Spark) and RE2 (DuckDB); whitespace spelled as an explicit
# class (RE2 \s lacks \x0B)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^ \t\n\x0B\f\r]+"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails and URLs with typed placeholders and count what was
    removed — the standard pre-training scrub pass.

    Counts are taken on the ORIGINAL text (an email inside a URL counts
    under both); replacement order is email-then-URL so `user@host`
    authority parts never leak through a URL that was truncated by the
    email placeholder."""
    email_n = F.regexp_count(F.col(text_col), F.lit(EMAIL_RE))
    url_n = F.regexp_count(F.col(text_col), F.lit(URL_RE))
    clean = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"), URL_RE, "<URL>"
    )
    return docs.select(
        "doc_id",
        email_n.cast("long").alias("n_emails"),
        url_n.cast("long").alias("n_urls"),
        clean.alias("clean_text"),
    )


# ---------------------------------------------- stratified sampling --


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: Dict[str, float],
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Keep each row with its stratum's probability, decided by a
    PORTABLE deterministic uniform: u = first 64 bits of
    md5(salt ':' key) as an integer, kept iff u < rate * 2^64.

    Unlike ``DataFrame.sample``/``rand()`` the decision depends only on
    the row's key — stable under repartitioning, retries, engine (the
    DuckDB oracle reproduces it bit-for-bit via the repo's
    ``('0x'||substr(md5(..),1,16))::UBIGINT`` convention), and cluster
    size; changing ``salt`` draws an independent sample."""
    from ..functions.hashing import md5_u64

    u = md5_u64(F.concat_ws(":", F.lit(salt), F.col(key_col)))
    # thresholds as STRING literals: rate * 2^64 exceeds LongType, and
    # the exact same integers must appear in the SQL oracle
    expr = F.lit(str(sample_threshold(default_rate))).cast("decimal(20,0)")
    for stratum, rate in sorted(rates.items()):
        cond = F.col(strata_col) == stratum
        lim = F.lit(str(sample_threshold(rate))).cast("decimal(20,0)")
        expr = F.when(cond, lim).otherwise(expr)
    return df.filter(u < expr)


def sample_threshold(rate: float) -> int:
    """rate -> integer cut on the md5-derived 64-bit uniform. Exposed so
    oracles/other engines inline the IDENTICAL integer."""
    return min(int(rate * (1 << 64)), (1 << 64))


# -------------------------------------------------- decontamination --


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination — the train/eval overlap gate every LLM
    data pipeline runs before training: flag corpus documents that share
    word ``n``-grams with a benchmark/eval set, so eval answers don't
    leak into the training corpus.

    Returns flagged docs only: (doc_id, n_ngrams, n_overlap,
    contamination) with n_ngrams = the doc's DISTINCT n-gram count,
    n_overlap = how many of those appear anywhere in the benchmark set,
    contamination = n_overlap / n_ngrams (rounded; exact IEEE division,
    oracle-comparable). Tokenization is the repo-wide convention
    (space-trim + lower + ASCII whitespace class) via
    ``dedup.shingles_df`` — the same Arrow-batched shingler the
    near-dup family uses (nested HOF shingling blows Janino, see that
    docstring).

    Scale posture (the reason this shape): benchmarks are SMALL by
    construction (thousands of docs), so their distinct n-gram set is
    broadcast; the corpus side is a map-side broadcast hash semi-join on
    the exploded shingles — only MATCHING rows reach the per-doc count
    shuffle, and the per-doc n_ngrams aggregate is pruned by a
    broadcast left-semi against the flagged doc ids first, so BOTH
    doc-keyed exchanges are sized by the contamination, not the corpus.
    100-TB posture: two map-only corpus passes, two broadcasts, two
    contamination-sized aggs.
    """
    from .dedup import shingles_df

    bench = (
        shingles_df(benchmark, id_col=id_col, text_col=text_col, n=n)
        .select("shingle")
        .distinct()
    )
    corp = shingles_df(corpus, id_col=id_col, text_col=text_col, n=n)
    hits = (
        corp.join(F.broadcast(bench), "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        # two consumers (the semi prune + the final join): materialize
        # the contamination-sized result once, or its corpus-scan
        # lineage replays inside the semi join's broadcast
        .localCheckpoint(eager=True)
    )
    # n_ngrams only for FLAGGED docs: a left-semi against the hit ids
    # (contamination-sized, broadcast) prunes the per-doc size agg to
    # the same cardinality as the output — without it the sizes
    # exchange ships one row per corpus document just to be discarded
    # by the inner join below
    sizes = (
        corp.join(F.broadcast(hits.select("id")), "id", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_ngrams"))
    )
    return (
        hits.join(sizes, "id")
        .select(
            F.col("id").alias(id_col),
            F.col("n_ngrams").cast("long").alias("n_ngrams"),
            F.col("n_overlap").cast("long").alias("n_overlap"),
            F.round(
                F.col("n_overlap").cast("double") / F.col("n_ngrams"), 6
            ).alias("contamination"),
        )
    )


# ------------------------------------------------------- chunking --


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    stride: int = 96,
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window context chunking: split each document into
    overlapping token windows of ``chunk_tokens`` advancing by
    ``stride`` — the pre-training/embedding chunker for documents longer
    than the model context.

    Chunk k covers tokens [k*stride, k*stride + chunk_tokens); chunk
    k >= 1 is emitted only if it contributes at least one NEW token
    ((k-1)*stride + chunk_tokens < n), so trailing windows fully
    contained in their predecessor never appear. Empty docs emit no
    chunks. Pure codegen (split + sequence + explode + slice): the
    explode fan-out is ~n/stride rows per doc and everything stays
    JVM-side; no shuffle at all.
    """
    if stride <= 0 or chunk_tokens <= 0 or stride > chunk_tokens:
        raise ValueError("need 0 < stride <= chunk_tokens")
    toks = tokens_col(F.col(text_col))
    base = docs.select(
        "doc_id", toks.alias("_toks"), F.size(toks).alias("_n")
    ).filter(F.col("_n") > 0)
    n = F.col("_n")
    n_chunks = F.when(
        n <= chunk_tokens, F.lit(1)
    ).otherwise(
        F.lit(1)
        + F.floor(
            (n - chunk_tokens + stride - 1) / F.lit(stride)
        ).cast("int")
    )
    chunked = base.withColumn(
        "chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1))
    )
    piece = F.slice(F.col("_toks"), F.col("chunk_idx") * stride + 1, chunk_tokens)
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


# ------------------------------------------------- sequence packing --

PACKING_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_tokens", LongType(), False),
        StructField("bin_id", StringType(), False),
        StructField("bin_fill", LongType(), False),
        StructField("bin_docs", LongType(), False),
    ]
)


def pack_documents(
    docs_with_counts: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
    n_groups: int = 64,
) -> DataFrame:
    """Greedy first-fit-decreasing sequence packing: assign each doc to
    a training bin of capacity ``max_tokens``, minimizing padding waste
    when examples are concatenated into fixed-length sequences.

    Packing is sequential per bin, so it runs per GROUP: docs are
    grouped by the deterministic key ``doc_id % n_groups`` (NOT Spark's
    physical partitioning — output must not change with cluster size),
    each group packs independently with FFD (sort by count desc, id
    asc; first bin that fits, else open a new one), and bin ids are
    group-prefixed. Oversized docs (count > max_tokens) get their own
    bin — flagged by bin_fill > max_tokens, never dropped silently.

    Invariants (pytest-pinned): every input doc appears exactly once;
    no multi-doc bin exceeds capacity; output is identical across
    partitionings; waste is bounded by FFD's guarantees per group.
    """

    def pack(pdf) -> "pd.DataFrame":
        import pandas as pd

        pdf = pdf.sort_values(
            [count_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        # the grouping key itself, not a re-derivation from id (a
        # non-integer id would collide prefixes across groups)
        group = int(pdf["_g"].iloc[0]) if len(pdf) else 0
        fills: list = []  # current fill per open bin
        counts: list = []  # docs per open bin
        assign: list = []
        for _, row in pdf.iterrows():
            n = int(row[count_col])
            placed = None
            for b in range(len(fills)):
                if fills[b] + n <= max_tokens:
                    placed = b
                    break
            if placed is None:
                fills.append(0)
                counts.append(0)
                placed = len(fills) - 1
            fills[placed] += n
            counts[placed] += 1
            assign.append(placed)
        return pd.DataFrame(
            {
                "doc_id": pdf[id_col].astype("int64"),
                "n_tokens": pdf[count_col].astype("int64"),
                "bin_id": [f"{group}-{b}" for b in assign],
                "bin_fill": [fills[b] for b in assign],
                "bin_docs": [counts[b] for b in assign],
            }
        )

    grouped = docs_with_counts.select(
        F.col(id_col), F.col(count_col).cast("long").alias(count_col)
    ).withColumn("_g", F.pmod(F.col(id_col), F.lit(n_groups)))
    return grouped.groupBy("_g").applyInPandas(lambda pdf: pack(pdf), PACKING_SCHEMA)


def paragraph_chunks(
    docs: DataFrame,
    sep_regex: str = r"\n{2,}",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text) — literal paragraph splitting
    (CCNet semantics: repeated-paragraph detection digests ``\\n\\n``
    splits, not fixed token windows, so a header/footer repeated at
    DIFFERENT offsets in different documents still digests identically).
    ``chunk_idx`` is the split position (gaps where empty paragraphs
    were dropped — a re-index would cost a per-doc window for a column
    boilerplate detection never reads). Shuffle-free codegen:
    split + posexplode, nothing leaves the JVM.
    """
    return (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col(text_col), sep_regex)).alias(
                "chunk_idx", "_raw"
            ),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.trim(F.col("_raw")).alias("chunk_text"),
        )
        .filter(F.length("chunk_text") > 0)
    )


def content_defined_chunks(
    docs: DataFrame,
    avg_tokens: int = 16,
    text_col: str = "text",
    salt: str = "cdc",
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_text) — content-defined
    chunking: a boundary falls AFTER every token t with
    md5(salt:t) % avg_tokens == 0, giving ~``avg_tokens``-token chunks
    whose edges depend on CONTENT, not offset (the Rabin-fingerprint
    boundary idea from dedup storage systems, with the repo's portable
    md5-u64 convention as the boundary test so any engine reproduces
    it). This is the delimiter-free generalization of
    :func:`paragraph_chunks`: a passage repeated at different token
    offsets in different documents produces identical interior chunks —
    exactly what fixed-stride windows (chunk_documents) can't see —
    even on crawl-normalized text with no newlines left to split on.

    Plan — SHUFFLE-FREE (re-planned in round 5): chunking is strictly
    per-document, so it runs as one Arrow ``mapInPandas`` pass over
    (doc_id, text) — zero exchanges. The first cut used a per-doc
    running-sum window plus a (doc, chunk) aggregation: correct, but it
    shuffled the full token stream TWICE (each exchange ~2-3x the text
    bytes) for a computation with no cross-row dependency at all — at
    100 TB those two shuffles dominate everything else. This is the
    repo's standing judgment call (see extract_triples, the minhash
    stage): built-ins first, but when the only built-in expression of a
    per-row computation forces corpus-sized exchanges (or nested
    higher-order functions that break whole-stage codegen), an
    Arrow-batched vectorized stage IS the better plan. Boundary-token
    decisions are memoized per batch (vocabulary-sized dict), and
    tokenization replicates the repo convention exactly — strip ASCII
    spaces, split on the explicit [ \\t\\n\\x0B\\f\\r]+ class, KEEPING
    leading/trailing empty fields (Spark's F.split uses limit=-1, which
    preserves them — unlike Java String.split's default — and the
    DuckDB string_split_regex oracles match that; the oracles also use
    the explicit ``trim(x, ' ')`` charset form, because DuckDB's bare
    ``trim()`` strips unicode spaces like NBSP where Spark's F.trim /
    Python's ``strip(' ')`` do not — NBSP-edged docs are in the fuzz
    parity corpus) — pinned by the
    token-partition test and the fuzz-corpus parity suite, which
    caught exactly this edge when the first cut dropped trailing
    empties.
    """
    import re

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    if avg_tokens < 2:
        raise ValueError("content_defined_chunks needs avg_tokens >= 2")
    id_type = docs.schema["doc_id"].dataType
    out_schema = StructType(
        [
            StructField("doc_id", id_type, True),
            StructField("chunk_idx", LongType(), True),
            StructField("n_tokens", LongType(), True),
            StructField("chunk_text", StringType(), True),
        ]
    )
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    mod = int(avg_tokens)

    def run(batches):
        import pandas as pd

        from ..functions.hashing import md5_u64_py

        bcache: dict = {}

        def is_boundary(tok: str) -> bool:
            b = bcache.get(tok)
            if b is None:
                b = md5_u64_py(f"{salt}:{tok}") % mod == 0
                bcache[tok] = b
            return b

        for pdf in batches:
            ids, cis, nts, txs = [], [], [], []
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                s = (text or "").strip(" ")
                if not s:
                    continue
                toks = ws.split(s)
                start, ci = 0, 0
                for i, t in enumerate(toks):
                    if is_boundary(t):
                        piece = toks[start : i + 1]
                        ids.append(did)
                        cis.append(ci)
                        nts.append(len(piece))
                        txs.append(" ".join(piece))
                        ci += 1
                        start = i + 1
                if start < len(toks):
                    piece = toks[start:]
                    ids.append(did)
                    cis.append(ci)
                    nts.append(len(piece))
                    txs.append(" ".join(piece))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype=pdf["doc_id"].dtype),
                    "chunk_idx": pd.Series(cis, dtype="int64"),
                    "n_tokens": pd.Series(nts, dtype="int64"),
                    "chunk_text": pd.Series(txs, dtype="object"),
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(run, out_schema)


# ------------------------------------------------------ shard layout --


def shard_assign(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """Deterministic training-shard assignment + within-shard order:
    the last mile of a training-data pipeline, where a cleaned corpus
    becomes N dataloader shards whose contents AND order must be
    reproducible run-to-run (resumable training needs "shard 7,
    position 1234" to mean the same example forever).

    shard    = md5_u64(salt:id) % n_shards   — uniform, key-only
    position = row_number() over (partition by shard
               order by md5_u64(pos:salt:id), id)  — a seeded global
    shuffle WITHIN each shard: training wants documents in random
    order, but rand() changes under retries/repartitioning; ordering
    by an md5-derived uniform gives a shuffle that is random-looking
    yet bit-stable across engines, partitionings, and reruns
    (same convention as stratified_sample; oracle via the UBIGINT
    form).

    Scale: one hash-partitioned window per shard — the shuffle is by
    the shard key, per-shard sort is the only per-group state, and
    shards are uniform by construction (no skew: the md5 uniform does
    not correlate with any data property). At 10^12 docs you'd raise
    n_shards so each shard's sort fits an executor (n_shards ~
    corpus/LB target shard size); the plan shape is unchanged.
    """
    from ..functions.hashing import md5_u64

    sid = F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
    pos = F.concat_ws(":", F.lit("pos"), F.lit(salt), F.col(id_col).cast("string"))
    from pyspark.sql import Window

    shard = (md5_u64(sid) % n_shards).cast("long")
    w = Window.partitionBy("shard").orderBy(md5_u64(pos), F.col(id_col))
    return (
        docs.select(F.col(id_col), shard.alias("shard"))
        .withColumn("position", F.row_number().over(w).cast("long"))
    )


def split_assign(
    docs: DataFrame,
    fractions: "list[tuple[str, float]]" = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split: every doc draws a uniform
    bucket from the repo-wide md5 convention and falls into the first
    cumulative-fraction range that covers it. The split is a pure
    function of (salt, id) — bit-stable across engines, partitionings,
    retries, and corpus growth (a doc never migrates between splits
    when new docs arrive, which rand()-based splitting cannot
    guarantee and which leaks eval data into training the moment a
    pipeline is re-run).

    Fractions are materialized as integer boundaries over 1e6 buckets
    (exact in both engines; no float comparison at the boundary).

    Scale: narrow per-row projection, no shuffle, whole-stage codegen;
    the downstream writer partitions by ``split``.
    """
    from ..functions.hashing import md5_u64

    total = sum(f for _, f in fractions)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = md5_u64(
        F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
    ) % 1_000_000
    expr = F.lit(fractions[-1][0])
    cum = 0
    bounds = []
    for name, frac in fractions[:-1]:
        cum += frac
        bounds.append((name, int(round(cum * 1_000_000))))
    for name, bound in reversed(bounds):
        expr = F.when(bucket < bound, F.lit(name)).otherwise(expr)
    return docs.select(F.col(id_col), expr.alias("split"))
