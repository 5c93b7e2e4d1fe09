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
