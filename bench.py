#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extras (pages_per_sec / triples_per_sec for the KG-extraction headline)
ride along as additional keys. Use scripts/bench_scaling.py for the
N-vs-4N parallelism run recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# pages for the extraction headline: scaled to the sf of the dir
_SF = SF_DIR.rstrip("/").split("sf")[-1]
try:
    SF_NUM = float(_SF)
except ValueError:
    SF_NUM = 0.1
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", str(int(200_000 * SF_NUM))))


def main() -> None:
    import __spark_entry__ as entry_mod
    from nlquery_spark.operators.extract import dedup_triples, extract_triples
    from nlquery_spark.plans import get_spark
    from nlquery_spark.sources.pages import orders_schema_spec, synth_pages

    spark = get_spark("nlquery-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # -- headline: KG triple extraction over synthetic CC-style pages -----
    pages = synth_pages(spark, N_PAGES, num_partitions=CPUS * 2)
    pages = pages.persist()
    n_pages = pages.count()  # materialize outside the timed window
    # steady-state measurement: spin up the python workers and compile
    # the matcher set on every core before the timed window (at corpus
    # scale this ramp amortizes to zero; untimed here for the same
    # reason the pages materialization is)
    dedup_triples(
        extract_triples(
            synth_pages(spark, CPUS * 40, num_partitions=CPUS), [orders_schema_spec()]
        )
    ).write.format("noop").mode("overwrite").save()
    # median of 3 timed repeats: VERDICT r6 ruled a single suite reading
    # can't adjudicate itself on this VM (ISOLATION_r06 documented a ~9x
    # noise envelope) — the median is the headline, every reading is
    # reported alongside so a spike is visible instead of decisive.
    # Each extract_triples invocation auto-mints a fresh chunk-memo
    # namespace, so every repeat is a production-like single pass
    # (cross-page boilerplate hits only) — a repeat never reads the
    # previous pass's cache.
    reps: list[float] = []
    n_triples = 0
    for _ in range(3):
        t0 = time.time()
        triples = dedup_triples(extract_triples(pages, [orders_schema_spec()]))
        n_triples = triples.count()
        reps.append(time.time() - t0)
    dt = sorted(reps)[1]
    timings["kg_extract_pages"] = round(dt, 3)
    extras["pages_per_sec"] = round(n_pages / dt, 1)
    extras["triples_per_sec"] = round(n_triples / dt, 1)
    extras["n_pages"] = n_pages
    extras["n_triples"] = n_triples
    extras["headline_runs_sec"] = [round(r, 3) for r in reps]
    pages.unpersist()

    # -- operator suite over the driver-provided tables -------------------
    # untimed suite warmup (VERDICT r5 item 6): the first timed query
    # used to absorb the whole-suite cold start (parquet footer reads,
    # scan/exchange/broadcast codegen — isolation showed q3 at 4.0s
    # in-suite vs 1.1s warm). One tiny scan+agg+broadcast-join touches
    # those paths before the timed loop so position-1 numbers are real.
    from pyspark.sql import functions as F

    _li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    _od = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    _li.groupBy("l_returnflag").agg(F.sum("l_quantity")).join(
        F.broadcast(_od.limit(100)), how="cross"
    ).write.format("noop").mode("overwrite").save()
    # ... and one tiny Arrow-batched pandas stage so the Python worker
    # pool + Arrow serializers are warm before the first timed
    # mapInPandas query (the extraction headline warms its own workers
    # but uses a separate profile)
    _od.limit(200).mapInPandas(
        lambda it: it, _od.schema
    ).write.format("noop").mode("overwrite").save()

    qs = entry_mod.queries()
    # every driver query rides along automatically — a new queries()
    # entry is benchmarked without touching this file
    suite = list(qs)
    for name in suite:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_NUM,
        **extras,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
