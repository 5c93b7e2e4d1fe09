#!/usr/bin/env python
"""One-shot sf1 benchmark datapoint (VERDICT r5 item 4).

The suite has only ever been timed at sf0.1; this script produces one
order-of-magnitude-larger datapoint so the linear-scaling claims
(shingle caps, wedge cutoffs, salted index, banded LSH) are validated
by measurement rather than argument — and so any
`max_center_degree`-class surprise surfaces here before a real cluster
finds it.

Dataset: /tmp/nlquery_sf1 (override $SPARK_GRAFT_SF1_DIR), derived
DETERMINISTICALLY from the driver-provided sf0.1 parquet — no external
data, rebuildable bit-identically:
  - documents:  10 copies; copy 0 verbatim, copy k>0 gets doc_id
    + k*10_000_000 and ``text || ' mirror<k> site<doc_id%97>'`` — the
    mirrored-page near-dup structure a web corpus actually has (10-deep
    near-dup clusters stress banding/verify; the tag keeps copies from
    being EXACT dups).
  - embeddings: 10 copies; vec_id offset, first component += k/1000
    (near-dup clusters for the LSH path).
  - orders/lineitem: 10 copies with orderkey offsets (part/customer
    keys unchanged -> 10x support on the co-order graph and 10x edges
    for negative sampling).
  - customer/part/supplier/nation/region: verbatim.

Workloads: the bench.py extraction headline at sf1-equivalent page
count, the dedup family at FULL corpus scale (the driver queries at
sf0.01 carry fixture-scale doc_id filters; here the operators run over
all 50k docs / 20k embeddings), and the KG family (extraction ->
pagerank / triangles / link prediction / negatives) — operator
parameters mirror the driver queries and the pipeline stages.

Prints one JSON line: {"metric": "sf1", "timings": {...},
"counts": {...}, "metrics": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/nlquery_sf1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
COPIES = 10


def build_dataset(spark) -> None:
    from pyspark.sql import functions as F

    def done(t):
        return os.path.exists(os.path.join(DST, f"{t}.parquet", "_SUCCESS"))

    def copies(df, offsets):
        out = None
        for k in range(COPIES):
            c = df
            for col, off in offsets(k).items():
                c = c.withColumn(col, F.col(col) + F.lit(off))
            out = c if out is None else out.unionByName(c)
        return out

    if not done("documents"):
        docs = spark.read.parquet(f"{SRC}/documents.parquet")
        out = None
        for k in range(COPIES):
            c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * 10_000_000))
            if k > 0:
                c = c.withColumn(
                    "text",
                    F.concat(
                        F.col("text"),
                        F.lit(f" mirror{k} site"),
                        (F.col("doc_id") % 97).cast("string"),
                    ),
                ).withColumn("n_chars", F.length("text"))
            out = c if out is None else out.unionByName(c)
        out.repartition(CPUS).write.mode("overwrite").parquet(
            f"{DST}/documents.parquet"
        )
    if not done("embeddings"):
        emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
        out = None
        for k in range(COPIES):
            c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * 10_000_000))
            if k > 0:
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, i: F.when(i == 0, x + F.lit(k / 1000.0)).otherwise(x),
                    ),
                )
            out = c if out is None else out.unionByName(c)
        out.repartition(CPUS).write.mode("overwrite").parquet(
            f"{DST}/embeddings.parquet"
        )
    if not done("orders"):
        orders = spark.read.parquet(f"{SRC}/orders.parquet")
        copies(orders, lambda k: {"o_orderkey": k * 1_000_000_000}).repartition(
            CPUS
        ).write.mode("overwrite").parquet(f"{DST}/orders.parquet")
    if not done("lineitem"):
        li = spark.read.parquet(f"{SRC}/lineitem.parquet")
        copies(li, lambda k: {"l_orderkey": k * 1_000_000_000}).repartition(
            CPUS
        ).write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")
    for t in ("customer", "part", "supplier", "nation", "region"):
        if not done(t):
            spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
                "overwrite"
            ).parquet(f"{DST}/{t}.parquet")


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from nlquery_spark.operators.dedup import (
        embedding_neardup_pairs,
        exact_dup_groups,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )
    from nlquery_spark.operators.extract import dedup_triples, extract_triples
    from nlquery_spark.operators.graph import common_neighbor_scores, triangle_counts
    from nlquery_spark.operators.canonicalize import pagerank
    from nlquery_spark.plans import get_spark
    from nlquery_spark.sources.pages import orders_schema_spec, synth_pages

    spark = get_spark(
        "bench-sf1", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_dataset(spark)

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    op_metrics: dict[str, dict] = {}

    def timed(name, fn):
        t0 = time.time()
        try:
            counts[name] = int(fn())
        except Exception as e:  # record, keep going — partial data beats none
            counts[name] = -1
            op_metrics[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s rows={counts[name]}", flush=True)

    docs = spark.read.parquet(f"{DST}/documents.parquet")
    emb = spark.read.parquet(f"{DST}/embeddings.parquet")

    # -- extraction headline at sf1-equivalent page count (bench.py shape)
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "200000"))
    pages = synth_pages(spark, n_pages, num_partitions=CPUS * 2).persist()
    pages.count()
    dedup_triples(
        extract_triples(
            synth_pages(spark, CPUS * 40, num_partitions=CPUS),
            [orders_schema_spec()],
        )
    ).write.format("noop").mode("overwrite").save()
    t0 = time.time()
    n_triples = dedup_triples(extract_triples(pages, [orders_schema_spec()])).count()
    dt = time.time() - t0
    timings["extract_headline"] = round(dt, 3)
    counts["extract_headline"] = n_triples
    op_metrics["extract_headline"] = {
        "pages": n_pages,
        "pages_per_sec": round(n_pages / dt, 1),
        "triples_per_sec": round(n_triples / dt, 1),
    }
    print(f"# extract_headline: {dt:.1f}s {n_pages/dt:.0f} pages/s", flush=True)
    pages.unpersist()

    # -- KG family over the 50k-doc corpus --------------------------------
    doc_pages = docs.select(
        F.concat(F.lit("doc:"), F.col("doc_id")).alias("url"), "text", "lang"
    )
    t0 = time.time()
    triples = dedup_triples(
        extract_triples(doc_pages, [em.DOCS_SCHEMA_SPEC], lang_filter=None)
    ).localCheckpoint(eager=True)
    timings["kg_extract_50k_docs"] = round(time.time() - t0, 3)
    counts["kg_extract_50k_docs"] = triples.count()
    print(f"# kg_extract_50k_docs: {timings['kg_extract_50k_docs']}s", flush=True)

    edges = (
        triples.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    counts["kg_edges"] = edges.count()

    timed("kg_pagerank", lambda: pagerank(edges, max_iter=30, tol=0.0).count())
    timed("kg_triangles", lambda: triangle_counts(edges).count())

    def _linkpred():
        m: dict = {}
        n = common_neighbor_scores(
            edges, min_common=2, max_center_degree=1000, metrics=m
        ).count()
        op_metrics["kg_linkpred"] = {
            k: v for k, v in m.items() if isinstance(v, (int, float))
        }
        return n

    timed("kg_linkpred", _linkpred)

    def _negatives():
        from nlquery_spark.operators.negatives import negative_samples

        orders = spark.read.parquet(f"{DST}/orders.parquet")
        cust = spark.read.parquet(f"{DST}/customer.parquet").select(
            F.col("c_custkey").alias("o_custkey")
        )
        return negative_samples(orders, "o_orderkey", "o_custkey", cust).count()

    timed("kg_negative_samples_6m_edges", _negatives)

    # -- dedup family, FULL corpus (no fixture filters) --------------------
    timed("dedup_exact_50k", lambda: exact_dup_groups(docs).count())

    def _jaccard():
        m: dict = {}
        n = ngram_jaccard_pairs(
            docs, n=2, threshold=0.12, max_shingle_df=40, metrics=m
        ).count()
        op_metrics["dedup_ngram_jaccard_50k"] = {
            k: v for k, v in m.items() if isinstance(v, (int, float))
        }
        return n

    timed("dedup_ngram_jaccard_50k", _jaccard)
    timed(
        "dedup_minhash_50k",
        lambda: minhash_lsh_pairs(docs, n=2, threshold=0.3).count(),
    )
    # max_hamming=3 is the production near-dup radius at corpus scale;
    # the sf0.01 driver query demonstrates the h=12 wide-radius variant
    # on 200 docs instead (2048-key blocking)
    timed("dedup_simhash_50k_h3", lambda: simhash_pairs(docs, max_hamming=3).count())

    def _embdedup():
        m: dict = {}
        n = embedding_neardup_pairs(
            emb, threshold=0.3, block_planes=None, n_tables=16, metrics=m
        ).count()
        op_metrics["dedup_embedding_20k"] = {
            k: v for k, v in m.items() if isinstance(v, (int, float))
        }
        return n

    timed("dedup_embedding_20k", _embdedup)

    # -- web/graph family at full corpus scale (VERDICT r6 item 3): the
    # r6-new operators had only ever been timed at sf0.1, and
    # redirects/LPA are iteration-dominated — the shapes most likely to
    # hide a super-linear surprise ------------------------------------
    from nlquery_spark.operators.graph import label_propagation
    from nlquery_spark.operators.web import crawl_diff, host_link_graph

    qs = em.queries()

    # 50k pages of synthesized HTML -> host link graph (driver-query
    # construction, unfiltered — _page_html has no fixture filter)
    timed(
        "web_link_graph_50k",
        lambda: host_link_graph(em._page_html(spark, DST)).count(),
    )

    # 50k URLs through a 5.5k-entry redirect map with real multi-hop
    # chains; 5 capped join rounds (the driver query, which is already
    # unfiltered — max_hops static rounds over the full corpus)
    timed(
        "web_redirects_50k",
        lambda: qs["web_redirect_resolve"](spark, DST).count(),
    )

    # crawl diff over ALL 50k docs: the driver query's messy-URL
    # generator repeats keys past doc_id 1261, so the full-scale
    # variant keys on the always-unique doc URL — the operator's cost
    # shape (one scan + one full-outer join) is what's being measured
    def _crawl_diff_50k():
        d = F.col("doc_id")
        base = docs.select(
            F.concat(F.lit("doc:"), d).alias("canonical_url"),
            F.md5("text").alias("dig_old"),
            F.md5(
                F.concat(
                    F.col("text"),
                    F.when(d % 6 == 2, F.lit(" v2")).otherwise(F.lit("")),
                )
            ).alias("dig_new"),
            d.alias("_d"),
        ).localCheckpoint(eager=True)
        old = base.filter(F.col("_d") % 10 != 3).select(
            "canonical_url", F.col("dig_old").alias("digest")
        )
        new = base.filter(F.col("_d") % 8 != 5).select(
            "canonical_url", F.col("dig_new").alias("digest")
        )
        return crawl_diff(old, new).count()

    timed("web_crawl_diff_50k", _crawl_diff_50k)

    # deterministic sync LPA on the full extracted KG edge set (the
    # iteration-dominated shape: per-round join + vote + top-1 window)
    def _lpa():
        m: dict = {}
        n = label_propagation(edges, iters=2, metrics=m).count()
        op_metrics["kg_lpa_communities"] = {
            k: v for k, v in m.items() if isinstance(v, (int, float))
        }
        return n

    timed("kg_lpa_communities", _lpa)

    # -- driver queries whose scale input actually grew 10x ----------------
    for name in ("part_coorder_triangles", "kg_similarity_edges"):
        timed(f"query_{name}", lambda n=name: qs[n](spark, DST).count())

    print(
        json.dumps(
            {
                "metric": "sf1",
                "sf": 1.0,
                "cpus": CPUS,
                "timings": timings,
                "counts": counts,
                "metrics": op_metrics,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
