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


# ---------------------------------------------------------------------------
# Boilerplate-chunk memo: extraction is a pure function of (chunk, spec,
# params), so memoized output must be bit-identical to recomputation.


def _memo_texts():
    texts = [_page_text(i, 0.0) for i in range(200)]
    # adversarial shapes: the SAME chunk at different absolute offsets
    # (memoized relative spans must shift exactly), empties, whitespace,
    # unicode spaces, and a prescreen-dead chunk sandwiched between hits
    texts += [
        "Total price above 1000. " * 3 + "Customers from Germany.",
        "xyzzy plugh. " + "Total price above 1000. " * 2,
        "",
        "   ",
        "  ",
        " price  below 5 Jan 2021." * 2,
        "no dictionary words here at all. Total price above 1000.",
    ]
    return texts


def test_chunk_memo_bit_identical():
    spec = orders_schema_spec()
    rec = build_recognizer([spec])
    screen = build_prescreen([spec])
    texts = _memo_texts()
    base = [extract_text_triples(t, rec, prescreen=screen) for t in texts]
    memo = {}
    first = [extract_text_triples(t, rec, prescreen=screen, memo=memo) for t in texts]
    assert len(memo) > 0
    # second pass is all-hit: every chunk replays from the memo
    replay = [extract_text_triples(t, rec, prescreen=screen, memo=memo) for t in texts]
    assert base == first == replay


def test_chunk_memo_offsets_shift_per_occurrence():
    """One chunk appearing at two offsets: memo hit must re-shift spans."""
    spec = orders_schema_spec()
    rec = build_recognizer([spec])
    sent = "Total price above 1000."
    text = sent + " filler words here. " + sent
    memo = {}
    got = extract_text_triples(text, rec, memo=memo)
    want = extract_text_triples(text, rec)
    assert got == want
    starts = sorted(t[3] for t in got)
    assert starts == sorted(t[3] for t in want)
    assert len({t[3] for t in got}) > 1  # both occurrences present, shifted


def test_chunk_memo_cap_evicts_and_stays_correct(monkeypatch):
    """Forcing the cap (VERDICT r7 item 3): half-eviction must keep the
    memo bounded AND output bit-identical to the unmemoized run."""
    import nlquery_spark.kernel.extract as ke

    monkeypatch.setattr(ke, "MEMO_MAX_CHUNKS", 3)
    spec = orders_schema_spec()
    rec = build_recognizer([spec])
    texts = [_page_text(i, 0.0) for i in range(30)]
    base = [extract_text_triples(t, rec) for t in texts]
    memo = {}
    got = [extract_text_triples(t, rec, memo=memo) for t in texts]
    assert got == base
    assert len(memo) <= 3  # evict-then-insert keeps it at the cap
    # replay over the warm (partially evicted) memo is still identical
    again = [extract_text_triples(t, rec, memo=memo) for t in texts]
    assert again == base


def test_memo_put_evicts_lru_half_only(monkeypatch):
    """At the cap, _memo_put drops the least-recently-used half and
    keeps the rest — never a wholesale clear (VERDICT r7 item 3)."""
    import nlquery_spark.kernel.extract as ke

    monkeypatch.setattr(ke, "MEMO_MAX_CHUNKS", 4)
    memo = {}
    for c in "abcd":
        ke._memo_put(memo, c, (c,))
    assert list(memo) == ["a", "b", "c", "d"]
    ke._memo_put(memo, "e", ("e",))
    # a,b (LRU half — never hit) evicted; c,d retained; e appended
    assert list(memo) == ["c", "d", "e"]
    assert memo["c"] == ("c",) and memo["d"] == ("d",)
    # degenerate cap of 1 still terminates and stays bounded at 2
    monkeypatch.setattr(ke, "MEMO_MAX_CHUNKS", 1)
    tiny = {}
    for c in "xyz":
        ke._memo_put(tiny, c, (c,))
    assert len(tiny) <= 2 and "z" in tiny


def test_memo_hit_refreshes_recency(monkeypatch):
    """_memo_hit re-appends on a hit, so a constantly-hit hot entry
    survives half-eviction even when it was inserted FIRST — the LRU
    property that a pure FIFO half-eviction lacks (measured: FIFO
    scores the same hit rate as wholesale clear on a hot-set +
    unique-filler stream; LRU keeps the hot set resident)."""
    import nlquery_spark.kernel.extract as ke

    monkeypatch.setattr(ke, "MEMO_MAX_CHUNKS", 4)
    memo = {}
    ke._memo_put(memo, "hot", ("hot",))
    for c in "abc":
        ke._memo_put(memo, c, (c,))
    # hit the hot entry: moves it to the newest end
    assert ke._memo_hit(memo, "hot") == ("hot",)
    assert list(memo) == ["a", "b", "c", "hot"]
    # a miss is None and does not disturb order
    assert ke._memo_hit(memo, "nope") is None
    # cap crossing now evicts a,b — the hot entry survives
    ke._memo_put(memo, "d", ("d",))
    assert "hot" in memo and list(memo) == ["c", "hot", "d"]


def test_chunk_memo_namespace_registry_bounded():
    import nlquery_spark.kernel.extract as ke

    ke._CHUNK_MEMO.clear()
    handles = [ke.chunk_memo(f"salt{i}", 1, True, 1000) for i in range(10)]
    assert len(ke._CHUNK_MEMO) <= 4
    # same key returns the same dict while it lives
    again = ke.chunk_memo("salt9", 1, True, 1000)
    assert again is handles[9]


def test_mentions_memo_bit_identical():
    from nlquery_spark.kernel.extract import extract_text_mentions

    spec = orders_schema_spec()
    rec = build_recognizer([spec])
    screen = build_prescreen([spec])
    texts = _memo_texts()
    base = [extract_text_mentions(t, rec, prescreen=screen) for t in texts]
    memo = {}
    first = [extract_text_mentions(t, rec, prescreen=screen, memo=memo) for t in texts]
    replay = [extract_text_mentions(t, rec, prescreen=screen, memo=memo) for t in texts]
    assert base == first == replay


def test_memo_cap_env_parse_and_disable(monkeypatch):
    """Review findings: a malformed NLQUERY_MEMO_MAX_CHUNKS degrades to
    the default with a warning (never an executor-killing ValueError),
    and cap <= 0 means memo DISABLED — no storage, no churn, correct
    output."""
    import warnings as w

    import nlquery_spark.kernel.extract as ke

    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        assert ke._parse_memo_cap("100k") == 100_000
        assert ke._parse_memo_cap(None) == 100_000
    assert any("not an integer" in str(x.message) for x in rec)
    assert ke._parse_memo_cap("250") == 250

    monkeypatch.setattr(ke, "MEMO_MAX_CHUNKS", 0)
    spec = orders_schema_spec()
    rec2 = build_recognizer([spec])
    texts = [_page_text(i, 0.0) for i in range(20)]
    base = [extract_text_triples(t, rec2) for t in texts]
    memo = {}
    got = [extract_text_triples(t, rec2, memo=memo) for t in texts]
    assert got == base
    assert memo == {}  # disabled: nothing ever stored
