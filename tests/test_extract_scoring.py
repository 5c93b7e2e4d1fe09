"""Equivalence of the prefix-sum scoring fast path vs the reference-shaped
slow path (IncludeZeroMatches + StubMatch materialization +
candidate_score)."""

import duckdb
import pytest

from nlquery_spark.kernel.extract import (
    MAX_COMBINATIONS,
    _chunks,
    _emit_triples,
    _ScoredCombo,
    _combo_compare,
    build_prescreen,
    build_recognizer,
    candidate_score,
    extract_text_triples,
)
from nlquery_spark.kernel.matches import Match, StubMatch
from nlquery_spark.kernel.recognizer import TopSet
from nlquery_spark.kernel.table import (
    ColumnConditionMatch,
    ColumnMatch,
    GroupMatch,
    TableMatch,
)
from nlquery_spark.kernel.tokenizer import tokenize
from nlquery_spark.kernel.tokens import TokenSequence
from nlquery_spark.sources.pages import _page_text, orders_schema_spec


def slow_extract(text, recognizer, prescreen=None, top_k=1):
    """The pre-optimization implementation: IncludeZeroMatches=True,
    stubs materialized, candidate_score over the full combination."""
    out = []
    recognizer.include_zero_matches = True
    try:
        for offset, chunk in _chunks(text):
            from nlquery_spark.kernel.extract import _chunk_can_match

            chunk_tokens = tokenize(chunk)
            if prescreen is not None and not _chunk_can_match(chunk_tokens, prescreen):
                continue
            seq = TokenSequence(chunk_tokens)
            top = TopSet(top_k, _combo_compare)
            state = {"n": 0}

            def handler(matches):
                significant = [m for m in matches if not isinstance(m, StubMatch)]
                if significant:
                    score = candidate_score(matches, seq, True)
                    top.add(_ScoredCombo(score, state["n"], significant))
                state["n"] += 1
                return state["n"] <= MAX_COMBINATIONS

            def match_filter(m):
                if isinstance(m, ColumnConditionMatch):
                    return m.value is not m or m.matched_value is not None
                return isinstance(m, (ColumnMatch, TableMatch, GroupMatch))

            recognizer.recognize(seq, handler, match_filter)
            for combo in top.to_array():
                out.extend(_emit_triples(combo.matches, seq, offset, combo.score))
    finally:
        recognizer.include_zero_matches = False
    return out


@pytest.mark.parametrize("source", ["synthetic", "documents"])
def test_fast_path_equals_slow_path(source):
    if source == "synthetic":
        texts = [_page_text(i, 0.0) for i in range(60)]
        spec = orders_schema_spec()
    else:
        import __spark_entry__ as em

        texts = [
            r[0]
            for r in duckdb.sql(
                "select text from '/root/testdata/sf0.001/documents.parquet' limit 60"
            ).fetchall()
        ]
        spec = em.DOCS_SCHEMA_SPEC
    rec = build_recognizer([spec])
    screen = build_prescreen([spec])
    for text in texts:
        fast = extract_text_triples(text, rec, prescreen=screen)
        slow = slow_extract(text, rec, prescreen=screen)
        assert fast == slow, text[:80]
