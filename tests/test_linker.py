"""Batched entity-link scorer: mention-detect rows + top-k per anchor."""

from pyspark.sql import functions as F

from nlquery_spark.operators.extract import extract_triples
from nlquery_spark.operators.linker import extract_mentions, link_topk
from nlquery_spark.sources.pages import orders_schema_spec, synth_pages


def test_extract_mentions_superset_of_triples(spark):
    # the winning combination's triples must all exist among the raw
    # candidate mentions (mentions = pre-combination bag)
    pages = synth_pages(spark, 40)
    mentions = extract_mentions(pages, [orders_schema_spec()])
    triples = extract_triples(pages, [orders_schema_spec()])
    m = {(r.url, r.name, r.value) for r in mentions.collect()
         if r.kind == "condition"}
    t = {(r.subj, r.pred, r.obj) for r in triples.collect()
         if r.rule in ("condition", "group")}
    assert t and t <= m
    # every mention has a sane span and score
    rows = mentions.collect()
    assert all(r.end > r.start and r.score > 0 for r in rows)


def test_link_topk_per_anchor(spark):
    pages = synth_pages(spark, 30)
    mentions = extract_mentions(pages, [orders_schema_spec()])
    linked = link_topk(mentions, k=2)
    rows = linked.collect()
    per_anchor = {}
    for r in rows:
        per_anchor.setdefault((r.url, r.start), []).append(r)
    assert per_anchor
    full = {}
    for r in mentions.collect():
        full.setdefault((r.url, r.start), []).append(r)
    for key, group in per_anchor.items():
        assert len(group) <= 2
        ranks = sorted(r.link_rank for r in group)
        assert ranks == list(range(1, len(group) + 1))
        # rank 1 carries the anchor's max score
        best = max(r.score for r in full[key])
        assert abs(max(r.score for r in group) - best) < 1e-12
