"""Text analysis operators for training-data pipelines.

All hot-path logic uses built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs. Each operator has an exact ANSI-SQL
oracle (see __spark_entry__.oracle_sql), which doubles as the correctness
spec.

Token model here is whitespace tokenization (the training-data-pipeline
convention), distinct from the reference-parity FSM tokenizer used for
triple extraction (nlquery_spark.kernel.tokenizer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Small language-marker sets for the n-gram/stopword language heuristic.
EN_MARKERS = ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"]
DE_MARKERS = ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"]
FR_MARKERS = ["le", "la", "les", "et", "est", "une", "pas", "pour", "que", "dans"]

EN_STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from", "has",
    "he", "in", "is", "it", "its", "of", "on", "that", "the", "to", "was",
    "were", "will", "with",
]


# column-level primitives live in the functions package; kept under the
# original names here for existing imports
from ..functions.text import tokens as tokens_col  # noqa: E402
from ..functions.text import token_count  # noqa: E402, F401


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens, n_chars_nospace, avg_token_len."""
    toks = tokens_col(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return df.withColumn("n_tokens", n_tokens).withColumn(
        "avg_token_len",
        F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(F.lit(0.0)),
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/stopword/alpha-ratio quality signals + a composite score.

    The composite mirrors common web-text quality filters (length band,
    stopword presence, alpha fraction); every term is SQL-expressible so
    the oracle is exact.

    Expensive base quantities (tokenize, stopword filter, regex strip)
    are computed in a first projection and only *referenced* afterwards —
    Catalyst's CollapseProject keeps multi-referenced non-cheap
    expressions separate, so each runs once per row instead of once per
    use site (~6x less work than a single fused expression tree).
    """
    toks = tokens_col(F.col(text_col))
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    base = df.select(
        "*",
        F.size(toks).alias("_n_tokens"),
        F.size(
            F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t)))
        ).alias("_n_stop"),
        F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", "")).alias("_alpha"),
        F.length(F.col(text_col)).alias("_chars"),
    )
    n_tokens = F.col("_n_tokens")
    stop_ratio = F.when(
        n_tokens > 0, F.col("_n_stop").cast("double") / n_tokens
    ).otherwise(0.0)
    alpha_ratio = F.when(
        F.col("_chars") > 0, F.col("_alpha").cast("double") / F.col("_chars")
    ).otherwise(0.0)
    length_ok = (n_tokens >= 10) & (n_tokens <= 100000)
    quality = (
        F.when(length_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.least(stop_ratio * F.lit(2.0), F.lit(0.3))
        + alpha_ratio * F.lit(0.3)
    )
    return (
        base.withColumn("n_tokens", n_tokens)
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("alpha_ratio", F.round(alpha_ratio, 6))
        .withColumn("quality", F.round(quality, 6))
        .drop("_n_tokens", "_n_stop", "_alpha", "_chars")
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic (en/de/fr/unknown), deterministic
    tie-break en > de > fr."""
    toks = F.transform(tokens_col(F.col(text_col)), F.lower)

    def hits(markers):
        arr = F.array(*[F.lit(w) for w in markers])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    # base projection so each marker scan runs once per row (CASE below
    # references each count three times)
    base = df.select(
        "*",
        hits(EN_MARKERS).alias("_en"),
        hits(DE_MARKERS).alias("_de"),
        hits(FR_MARKERS).alias("_fr"),
    )
    en, de, fr = F.col("_en"), F.col("_de"), F.col("_fr")
    lang = (
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("unknown"))
    )
    return base.withColumn("lang_pred", lang).drop("_en", "_de", "_fr")


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    lowercase token set (classic bag-fingerprint for near-identical doc
    grouping; robust to token reordering/duplication)."""
    toks = F.transform(tokens_col(F.col(text_col)), F.lower)
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return df.withColumn("fingerprint", F.md5(canon))


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf
    (tf * ln(N/df)) — keyword extraction, the per-document counterpart
    of bm25_topk's per-query ranking. Output: (doc_id, token, score,
    rk) with score ROUNDed to 6 and a (score DESC, token ASC) total
    order, so ranking happens on the ROUNDED value and an ANSI-SQL
    oracle ranks identically (the BM25 ln-bit-safety argument; the
    tie-break makes rk deterministic).

    Plan — ONE corpus scan: the (doc, token) tf aggregate is eagerly
    checkpointed (it feeds both the df reduction and the scoring join);
    document frequencies reduce from it into a vocabulary-sized frame
    that BROADCASTS onto the scoring side; the final top-k is a
    doc-keyed window over the tf relation. N comes from a count on the
    docs relation (one cheap metadata-ish job), not a second
    tokenization.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
            "token"
        ),
    # the shared split convention KEEPS leading/trailing empty fields
    # (pinned repo-wide); for KEYWORD output specifically an ''-token
    # is junk with a misleadingly high idf on edge-whitespace docs —
    # drop it on both sides (the oracle mirrors token <> '')
    ).filter(F.col("token") != "")
    tf = (
        toks.groupBy("doc", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        # two consumers (df reduction + scoring join): one
        # materialization, or the corpus tokenization replays twice
        .localCheckpoint(eager=True)
    )
    n_docs = docs.select(id_col).distinct().count()
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    score = F.round(
        F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
    )
    w = Window.partitionBy("doc").orderBy(F.desc("score"), F.asc("token"))
    return (
        tf.join(F.broadcast(dfreq), "token")
        .select("doc", "token", score.alias("score"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.col("doc").alias(id_col),
            "token",
            "score",
            F.col("rk").cast("int").alias("rk"),
        )
    )


# Gopher's required-stopword list (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", §A1.1: a document must contain >= 2 of these).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1) —
    the second standard web-corpus filter family next to C4's: word
    count band, mean word length band, symbol-to-word ratio (``#`` and
    ``...``), fraction of words containing an alphabetic character, and
    required-stopword hits. Emits one boolean per rule plus the
    composite ``keep`` so a pipeline can both filter and AUDIT which
    rule fired (the operational need: at corpus scale you tune
    thresholds from per-rule reject rates, never from the composite).

    Word model is whitespace words (the corpus-filter convention; the
    repo-wide explicit class, not ``\\s`` — Java ``\\s`` includes
    ``\\x0B``, RE2's does not). All flat-column HOFs in one projection:
    narrow, zero shuffle, whole-stage codegen, oracle-exact.
    """
    words = F.filter(
        F.split(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+"),
        lambda w: w != "",
    )
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    base = df.select(
        "*",
        F.size(words).alias("_nw"),
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).alias("_chars"),
        F.size(
            F.filter(words, lambda w: w.rlike("[A-Za-z]"))
        ).alias("_alpha_w"),
        F.size(
            F.filter(
                words, lambda w: (w == "#") | w.contains("...")
            )
        ).alias("_sym_w"),
        F.size(
            F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w)))
        ).alias("_stop_w"),
    )
    nw = F.col("_nw")
    mean_len = F.when(nw > 0, F.col("_chars").cast("double") / nw).otherwise(
        F.lit(0.0)
    )
    alpha_ratio = F.when(
        nw > 0, F.col("_alpha_w").cast("double") / nw
    ).otherwise(F.lit(0.0))
    sym_ratio = F.when(nw > 0, F.col("_sym_w").cast("double") / nw).otherwise(
        F.lit(0.0)
    )
    ok_words = (nw >= min_words) & (nw <= max_words)
    ok_mean = (mean_len >= min_mean_word_len) & (mean_len <= max_mean_word_len)
    ok_sym = sym_ratio <= max_symbol_ratio
    ok_alpha = alpha_ratio >= min_alpha_word_ratio
    ok_stop = F.col("_stop_w") >= min_stop_hits
    return (
        base.withColumn("n_words", nw)
        .withColumn("mean_word_len", F.round(mean_len, 6))
        .withColumn("ok_word_count", ok_words.cast("int"))
        .withColumn("ok_mean_word_len", ok_mean.cast("int"))
        .withColumn("ok_symbol_ratio", ok_sym.cast("int"))
        .withColumn("ok_alpha_words", ok_alpha.cast("int"))
        .withColumn("ok_stopwords", ok_stop.cast("int"))
        .withColumn(
            "keep",
            (ok_words & ok_mean & ok_sym & ok_alpha & ok_stop).cast("int"),
        )
        .drop("_nw", "_chars", "_alpha_w", "_sym_w", "_stop_w")
    )
