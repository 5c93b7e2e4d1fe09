"""Canonicalization + checkpointed-pipeline tests: component quality,
resume-from-checkpoint equivalence, metrics/lineage presence."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from nlquery_spark.operators.canonicalize import (
    canonical_mapping,
    connected_components,
    similarity_edges,
)
from nlquery_spark.plans.pipeline import Pipeline, Stage, kg_pipeline
from nlquery_spark.sources.pages import orders_schema_spec, synth_pages


def test_canonical_mapping_clusters_variants(spark):
    forms = spark.createDataFrame(
        [
            ("Krusovice",),
            ("Krusovice 0.5l",),
            ("krusovice",),
            ("Italy",),
            ("italy",),
            ("France",),
            ("totally different",),
        ],
        "form string",
    )
    mapping = {r.form: r.canonical_id for r in canonical_mapping(forms, threshold=0.5).collect()}
    assert mapping["Krusovice"] == mapping["krusovice"] == mapping["Krusovice 0.5l"]
    assert mapping["Italy"] == mapping["italy"]
    assert mapping["Italy"] != mapping["France"]
    assert mapping["totally different"] not in (mapping["Italy"], mapping["Krusovice"])


def test_connected_components_chain(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "form_a string, form_b string"
    )
    nodes = spark.createDataFrame([("a",), ("b",), ("c",), ("x",), ("y",), ("z",)], "form string")
    cc = {r.form: r.component for r in connected_components(edges, nodes).collect()}
    assert cc["a"] == cc["b"] == cc["c"] == "a"
    assert cc["x"] == cc["y"] == "x"
    assert cc["z"] == "z"


def test_connected_components_driver_equals_distributed(spark):
    """The adaptive driver-side union-find path must label identically
    to the distributed hash-to-min loop (forced via driver_max_graph=0),
    including a longer chain (diameter > 2) and isolated nodes."""
    edges = spark.createDataFrame(
        [("d", "c"), ("c", "b"), ("b", "a"), ("p", "q"), ("q", "p")],
        "form_a string, form_b string",
    )
    nodes = spark.createDataFrame(
        [(x,) for x in "abcdpqz"], "form string"
    )
    fast = {r.form: r.component for r in connected_components(edges, nodes).collect()}
    dist = {
        r.form: r.component
        for r in connected_components(edges, nodes, driver_max_graph=0).collect()
    }
    assert fast == dist
    assert fast["d"] == fast["a"] == "a" and fast["p"] == "p" and fast["z"] == "z"


def test_pipeline_resume(spark, tmp_path):
    workdir = str(tmp_path / "pipe")
    pages = synth_pages(spark, 80).cache()
    pages.count()
    stages = kg_pipeline(workdir, [orders_schema_spec()])

    p1 = Pipeline(spark, workdir, stages)
    out1 = p1.run({"pages": pages})
    final1 = sorted(tuple(r) for r in out1["canonical"].drop("start", "end", "rule").collect())
    assert all(s["status"] == "computed" for s in p1.report)

    # lineage + metrics exist
    assert os.path.exists(os.path.join(workdir, "_meta", "extract.json"))
    assert os.path.exists(os.path.join(workdir, "_metrics", "dedup"))

    # simulate a crash after stage 1: drop later stages, rerun
    shutil.rmtree(os.path.join(workdir, "dedup"))
    shutil.rmtree(os.path.join(workdir, "canonical"))
    p2 = Pipeline(spark, workdir, kg_pipeline(workdir, [orders_schema_spec()]))
    out2 = p2.run({"pages": pages})
    statuses = {s["stage"]: s["status"] for s in p2.report}
    assert statuses["extract"] == "resumed"
    assert statuses["dedup"] == "computed"
    final2 = sorted(tuple(r) for r in out2["canonical"].drop("start", "end", "rule").collect())
    assert final1 == final2

    # full resume: nothing recomputed, same output
    p3 = Pipeline(spark, workdir, kg_pipeline(workdir, [orders_schema_spec()]))
    out3 = p3.run({"pages": pages})
    assert all(s["status"] == "resumed" for s in p3.report)
    final3 = sorted(tuple(r) for r in out3["canonical"].drop("start", "end", "rule").collect())
    assert final1 == final3


def test_canonicalized_triples_cluster_gazetteer_variants(spark):
    pages = synth_pages(spark, 150)
    from nlquery_spark.operators.extract import dedup_triples, extract_triples
    from nlquery_spark.operators.canonicalize import canonicalize_triples

    triples = dedup_triples(extract_triples(pages, [orders_schema_spec()]))
    canon = canonicalize_triples(triples)
    assert canon.filter(F.col("obj_canonical").isNull()).count() == 0
    # canonicalization must not *increase* distinct objects
    assert (
        canon.select("obj_canonical").distinct().count()
        <= canon.select("obj").distinct().count()
    )
