"""Deterministic synthetic Common-Crawl-style pages source.

Schema per BASELINE.json input_hint: (url string, warc_ts timestamp,
html binary, text string, lang string). Generation is distributed
(``spark.range`` + ``mapInPandas``) and *keyed by row id*, so the output
is identical regardless of parallelism or partitioning — the property the
scaling benchmark (local[8] vs local[32]) and resume tests rely on.

Texts embed query-like sentences drawn from the Orders fixture dictionary
(FIXTURES.md §2a, mirroring the reference's end-to-end test schema,
RecognizerTests.cs:52-103) inside filler prose. ``skew_entity_frac``
makes one entity value dominate to exercise hot-key handling.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timedelta
from typing import Iterator, List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

_FILLER = (
    "the quick brown fox jumps over a lazy dog while rain falls on green "
    "hills and children play near the river bank watching boats drift by "
    "slowly under bright warm skies full of birds"
).split()

_COUNTRIES = ["Italy", "France", "USA", "Canada"]
_PRODUCTS = ["Bud 6pcs", "Krusovice 0.5l"]
_CUSTOMERS = ["Acme Corp", "John Smith", "Jane Doe", "Globex"]
_MONTHS = [
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
]

_TEMPLATES = [
    "show customer order from {country} placed yesterday",
    "customer {customer} ordered {product} last month",
    "internal id {num}",
    "orders with value = {num} or value < {num2}",
    "{product} delivered before {day} {month} {year}",
    "orders from {country} shipped {day}.{monthnum}.{year}",
    "value more than {num}",
    "customer {customer} from {country}",
]

_EPOCH = datetime(2024, 1, 1)


def _rand(seed: int, salt: int) -> int:
    """Stable 32-bit hash — independent of Python hash randomization."""
    return zlib.crc32(f"{seed}:{salt}".encode()) & 0x7FFFFFFF


def _page_text(i: int, skew_entity_frac: float) -> str:
    """Deterministic text for row id ``i``."""
    parts: List[str] = []
    n_sentences = 2 + _rand(i, 1) % 4
    for s in range(n_sentences):
        r = _rand(i, 10 + s)
        if r % 100 < 45:  # ~45% filler sentences
            k = 5 + r % 12
            words = [_FILLER[_rand(i, 100 * s + w) % len(_FILLER)] for w in range(k)]
            parts.append(" ".join(words) + ".")
        else:
            t = _TEMPLATES[r % len(_TEMPLATES)]
            if skew_entity_frac > 0 and (r % 1000) < skew_entity_frac * 1000:
                country = _COUNTRIES[0]  # hot entity
            else:
                country = _COUNTRIES[_rand(i, 200 + s) % len(_COUNTRIES)]
            sentence = t.format(
                country=country,
                product=_PRODUCTS[_rand(i, 300 + s) % len(_PRODUCTS)],
                customer=_CUSTOMERS[_rand(i, 400 + s) % len(_CUSTOMERS)],
                num=1 + _rand(i, 500 + s) % 5000,
                num2=1 + _rand(i, 600 + s) % 100,
                day=1 + _rand(i, 700 + s) % 28,
                month=_MONTHS[_rand(i, 800 + s) % 12],
                monthnum=1 + _rand(i, 800 + s) % 12,
                year=2015 + _rand(i, 900 + s) % 10,
            )
            parts.append(sentence + ".")
    return " ".join(parts)


def synth_pages(
    spark: SparkSession,
    n: int,
    skew_entity_frac: float = 0.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Generate ``n`` deterministic pages as a DataFrame."""
    rng = spark.range(0, n, 1, num_partitions) if num_partitions else spark.range(n)

    def gen(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].tolist()
            texts = [_page_text(i, skew_entity_frac) for i in ids]
            yield pd.DataFrame(
                {
                    "url": [f"https://example.org/page/{i}" for i in ids],
                    "warc_ts": [_EPOCH + timedelta(seconds=int(i)) for i in ids],
                    "html": [
                        b"<html><body>" + t.encode("utf-8") + b"</body></html>"
                        for t in texts
                    ],
                    "text": texts,
                    "lang": [
                        "en" if _rand(i, 2) % 20 else ("de" if i % 2 else "fr")
                        for i in ids
                    ],
                }
            )

    return rng.mapInPandas(gen, PAGES_SCHEMA)


def orders_schema_spec() -> dict:
    """The Orders dictionary spec (FIXTURES.md §2a, verbatim from the
    reference end-to-end fixture RecognizerTests.cs:52-103)."""
    return {
        "caption": "Orders",
        "name": "orders",
        "columns": [
            {
                "caption": "Product",
                "name": "product_name",
                "datatype": "string",
                "values": ["Bud 6pcs", "Krusovice 0.5l"],
            },
            {"caption": "Customer", "name": "customer", "datatype": "string"},
            {
                "caption": "Country",
                "name": "country",
                "datatype": "string",
                "values": ["Italy", "France", "USA", "Canada"],
            },
            {"caption": "Placed Date", "name": "placed_date", "datatype": "date"},
            {
                "caption": "Shipped Date",
                "alt_captions": ["Delivered Date"],
                "name": "shipped_date",
                "datatype": "date",
            },
            {
                "caption": "Internal ID",
                "name": "id",
                "datatype": "string",
                "exact_only": True,
            },
            {"caption": "super_id", "name": "super_id", "datatype": "string", "exact_only": True},
            {"caption": "value", "name": "value", "datatype": "number"},
        ],
    }
