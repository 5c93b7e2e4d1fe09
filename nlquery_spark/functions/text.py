"""Text column functions (JVM-side, codegen-friendly)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokens; empty text -> empty array (not ['']).

    The ASCII `\\s+` split matches the reference tokenizer's whitespace
    classes for plain words (kernel/tokenizer.py handles the full
    lossless token-type FSM; this is the cheap JVM-side variant for
    stats/shingles where only word boundaries matter).
    """
    return F.when(
        F.length(F.trim(text)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(text), r"\s+"))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer pattern, restricted to constructs shared by
# Java regex (Spark codegen) and RE2 (DuckDB oracle): the upstream GPT-2
# pattern's trailing-space lookahead `\s+(?!\S)` is dropped because RE2
# has no lookahead — whitespace runs still form single tokens, so counts
# stay within ~1% of the upstream tokenizer on prose while remaining
# engine-portable and exactly reproducible in the oracle. Whitespace is
# an EXPLICIT class because Java \s includes \x0B while RE2 \s does not.
_WS = r" \t\n\x0B\f\r"
BPE_PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+"
    rf"| ?[^{_WS}\p{{L}}\p{{N}}]+|[{_WS}]+"
)


def subword_tokens(text: Column) -> Column:
    """BPE-ish pre-tokenization (JVM regexp, stays in codegen): the
    standard LLM-pipeline token-count estimator when a real tokenizer
    model is unavailable executor-side."""
    return F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_PATTERN), 0)


def subword_count(text: Column) -> Column:
    return F.size(subword_tokens(text))
