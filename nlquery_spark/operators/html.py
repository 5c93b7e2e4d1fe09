"""HTML -> text extraction for Common-Crawl-style page tables.

The input schema (BASELINE.json input_hint) carries both ``html binary``
and ``text string``; real crawls only have the former. This stage
produces the text column from the html bytes with a deterministic,
dependency-free extractor (no bs4/lxml in this environment), vectorized
per Arrow batch. The north-rule invariant — extracted per-url text
byte-identical to the reference text — is asserted in
tests/test_html_extract.py over the synthesized corpus.

Extraction rules (applied in order, mirroring the common
strip-tags pipeline):
1. decode UTF-8 (errors="replace")
2. drop <script>/<style>/<!-- --> blocks entirely
3. replace block-level closing tags and <br> with a space
4. strip remaining tags
5. unescape HTML entities
6. collapse whitespace runs to single spaces, trim
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StringType

_SCRIPT_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>|<!--.*?-->", re.IGNORECASE | re.DOTALL
)
_BLOCK_RE = re.compile(
    r"</(p|div|li|ul|ol|h[1-6]|tr|table|section|article|header|footer|blockquote)\s*>"
    r"|<br\s*/?>",
    re.IGNORECASE,
)
# HTML5 rule: '<' only opens a tag when followed by a tag-name char,
# '/' or '!' — a literal '< 129' in text (e.g. "value < 129") is text,
# and must not be swallowed up to the next '>' (the closing </body>).
_TAG_RE = re.compile(r"<[/!]?[a-zA-Z][^>]*>")
# ASCII whitespace only: unicode \s would collapse &nbsp; (\xa0) into a
# plain space and break the byte-identical invariant for texts that
# legitimately contain it.
_WS_RE = re.compile(r"[ \t\r\n\f\v]+")


def extract_text_str(raw: bytes | str | None) -> str:
    """Pure-python extractor for one document (the per-row kernel)."""
    if raw is None:
        return ""
    s = raw.decode("utf-8", errors="replace") if isinstance(raw, (bytes, bytearray)) else raw
    s = _SCRIPT_RE.sub(" ", s)
    s = _BLOCK_RE.sub(" ", s)
    s = _TAG_RE.sub("", s)
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip()


def extract_text(html_col: Column) -> Column:
    """Arrow-vectorized html->text column function."""

    @F.pandas_udf(StringType())
    def _extract(htmls: pd.Series) -> pd.Series:
        return htmls.map(extract_text_str)

    return _extract(html_col)


def with_extracted_text(
    pages: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Replace/add the text column extracted from html bytes."""
    return pages.withColumn(out_col, extract_text(F.col(html_col)))
