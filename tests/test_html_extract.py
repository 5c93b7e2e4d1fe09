"""HTML -> text extraction: the north-rule invariant (extracted per-url
text byte-identical to the reference text column) plus messy-html units."""

from pyspark.sql import functions as F

from nlquery_spark.operators.html import extract_text_str, with_extracted_text
from nlquery_spark.sources.pages import synth_pages


def test_byte_identical_on_synthesized_corpus(spark):
    """input_hint invariant: per-url extracted text == reference text,
    byte for byte, across the whole synthesized corpus."""
    pages = synth_pages(spark, 500)
    out = with_extracted_text(pages.drop("text"), out_col="text")
    mismatches = (
        out.alias("o")
        .join(pages.select("url", F.col("text").alias("ref")), "url")
        .filter(F.col("text") != F.col("ref"))
        .count()
    )
    assert mismatches == 0
    assert out.count() == 500


def test_script_style_comments_dropped():
    raw = (
        b"<html><head><style>body{color:red}</style>"
        b"<script>var x = '<p>not text</p>';</script></head>"
        b"<body>real <!-- hidden --> content</body></html>"
    )
    assert extract_text_str(raw) == "real content"


def test_block_tags_become_spaces_and_entities_unescape():
    raw = b"<p>one</p><p>two&nbsp;&amp; three</p><br>four"
    assert extract_text_str(raw) == "one two\xa0& three four"


def test_invalid_utf8_and_none():
    assert extract_text_str(None) == ""
    assert extract_text_str(b"<b>ok\xff</b>") == "ok�"


def test_inline_tags_do_not_insert_spaces():
    assert extract_text_str(b"<b>bo</b>ld") == "bold"
