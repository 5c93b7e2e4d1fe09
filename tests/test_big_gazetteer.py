"""MovieLens-style NER lifecycle (SURVEY.md §3.1): 5000-value gazetteer
dictionary compiled and recognized, reproducing the reference's
NerByDataset example shape (Program.cs:87-115) with its stop-word list."""

import zlib

from nlquery_spark.kernel.extract import (
    build_prescreen,
    build_recognizer,
    extract_text_triples,
)
from nlquery_spark.kernel.table import ENGLISH_STOP_WORDS

_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "fox", "golf", "hotel",
    "india", "jazz", "kilo", "lima", "mike", "nova", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango",
]


def movielens_spec(n_titles: int = 5000) -> dict:
    titles = []
    for i in range(n_titles):
        a = _WORDS[zlib.crc32(f"a{i}".encode()) % 20]
        b = _WORDS[zlib.crc32(f"b{i}".encode()) % 20]
        titles.append(f"{a.title()} {b.title()} ({1950 + i % 70})")
    return {
        "caption": "Films",
        "name": "movielens",
        "columns": [
            {"caption": "Title", "name": "Title", "datatype": "string", "values": titles},
            {
                "caption": "Genres",
                "name": "Genres",
                "datatype": "string",
                "values": ["Action", "Comedy", "Drama", "Thriller", "Sci-Fi", "Romance"],
            },
            {
                "caption": "Year",
                "name": "Year",
                "datatype": "number",
                "values": [str(1950 + i) for i in range(70)],
            },
        ],
    }


def test_big_gazetteer_recognition():
    spec = movielens_spec()
    opts = {"stop_words": ENGLISH_STOP_WORDS}
    rec = build_recognizer([spec], opts)
    screen = build_prescreen([spec], opts)

    triples = extract_text_triples(
        "show me Alpha Bravo comedy films of 1984", rec, prescreen=screen
    )
    preds = {t[0] for t in triples}
    # title tokens recognized against the 5000-value gazetteer
    assert any(p.startswith("Title:") for p in preds), triples
    objs = {t[1] for t in triples if t[0].startswith("Title:")}
    assert any("Alpha Bravo" in o for o in objs), triples

    # genre gazetteer via like/contains
    triples2 = extract_text_triples("best Comedy films", rec, prescreen=screen)
    assert any(
        t[0].startswith("Genres:") and t[1] == "Comedy" for t in triples2
    ), triples2


def test_big_gazetteer_no_false_hits_on_filler():
    spec = movielens_spec()
    rec = build_recognizer([spec])
    screen = build_prescreen([spec])
    out = extract_text_triples(
        "completely unrelated filler text without dictionary entries",
        rec,
        prescreen=screen,
    )
    # 'filler' contains no gazetteer token; prescreen or recognition must
    # produce nothing significant with score >= 0.5
    assert not [t for t in out if t[2] >= 0.5], out


def test_threshold_bounds_hot_token_fanout():
    """A year token matching thousands of titles stays bounded by the
    max-score filter threshold (ListContainsMatcher.cs:37,100-118) — the
    reference's own skew guard, preserved in the port."""
    spec = movielens_spec()
    rec = build_recognizer([spec])
    screen = build_prescreen([spec])
    out = extract_text_triples("1984", rec, prescreen=screen)
    # bounded, not thousands
    assert len(out) < 50, len(out)
