"""Property-based tests (hypothesis) for the parity-critical pure
kernels — no Spark session needed, so these run in milliseconds.

The reference's own losslessness contract: concatenating token values
reproduces the input exactly (TokenizerTests.cs:41). Goldens pin the
known cases; these properties pin it for arbitrary unicode inputs.
"""

from hypothesis import given, settings, strategies as st

from nlquery_spark.kernel.tokenizer import tokenize
from nlquery_spark.operators.html import extract_text_str

# printable-ish unicode incl. whitespace classes, digits, punctuation
_texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)


@settings(max_examples=300, deadline=None)
@given(_texts)
def test_tokenizer_lossless_on_arbitrary_unicode(s):
    toks = tokenize(s)
    assert "".join(t.value for t in toks) == s


@settings(max_examples=300, deadline=None)
@given(_texts)
def test_tokenizer_offsets_partition_input(s):
    toks = tokenize(s)
    pos = 0
    for t in toks:
        assert t.start_index == pos
        pos += len(t.value)
    assert pos == len(s)


@settings(max_examples=300, deadline=None)
@given(_texts)
def test_html_extract_never_crashes_and_is_idempotent(s):
    out = extract_text_str(s.encode("utf-8", errors="replace"))
    assert isinstance(out, str)
    # extraction of already-extracted text is a fixpoint unless the text
    # contains markup-like remnants the first pass legitimately removed
    again = extract_text_str(out)
    assert extract_text_str(again) == again


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=200))
def test_html_extract_handles_arbitrary_bytes(b):
    out = extract_text_str(b)
    assert isinstance(out, str)
    assert "  " not in out  # whitespace fully collapsed
    assert out == out.strip()
