#!/usr/bin/env python
"""Per-query COLD vs WARM isolation timings (VERDICT r2 item 5).

Suite-level timings share one JVM: a query's number absorbs whatever
codegen caches, shuffle files, and page cache the queries before it
left behind, and same-day VM noise has measured +-50% on this box
(BENCH/BASELINE.md). This harness removes both confounds: each query
gets a FRESH python+JVM process (cold = first run, including Janino
compilation and python-worker spinup) and is then repeated in-process
(warm = steady state). Run on an idle box; results land in
BENCH/ISOLATION_r{N}.md.

Usage: python scripts/bench_isolation.py [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS (default 32), repeats via SPARK_GRAFT_ISO_RUNS.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT = [
    "streaming_extract",
    "emb_cosine_jvm",
    "nl_filter_inferred",
    "dict_spec_part",
]

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
import __spark_entry__ as em
from nlquery_spark.plans import get_spark
name = sys.argv[1]
n_runs = int(os.environ.get("SPARK_GRAFT_ISO_RUNS", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("bench-isolation", master=f"local[{CPUS}]",
                  shuffle_partitions=max(CPUS, 8))
spark.sparkContext.setLogLevel("ERROR")
if name == "kg_extract_pages":
    # the bench.py HEADLINE (synthetic CC-style pages), not a queries()
    # entry: replicate its exact shape incl. the untimed worker warmup
    from nlquery_spark.operators.extract import dedup_triples, extract_triples
    from nlquery_spark.sources.pages import orders_schema_spec, synth_pages
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES",
                                 str(int(200_000 * float(sf)))))
    pages = synth_pages(spark, n_pages, num_partitions=CPUS * 2).persist()
    pages.count()
    dedup_triples(extract_triples(
        synth_pages(spark, CPUS * 40, num_partitions=CPUS),
        [orders_schema_spec()])).write.format("noop").mode("overwrite").save()
    def run_once():
        dedup_triples(extract_triples(pages, [orders_schema_spec()])).count()
else:
    q = em.queries()[name]
    def run_once():
        q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
runs = []
for _ in range(n_runs):
    t0 = time.time()
    run_once()
    runs.append(round(time.time() - t0, 3))
print("ISOLATION_JSON " + json.dumps(
    {"query": name, "cold": runs[0], "warm": runs[1:]}))
spark.stop()
"""


def main() -> None:
    queries = sys.argv[1:] or DEFAULT
    results = []
    timeout_s = int(os.environ.get("SPARK_GRAFT_ISO_TIMEOUT", "900"))
    for name in queries:
        try:
            r = subprocess.run(
                [sys.executable, "-c", CHILD, name],
                capture_output=True,
                text=True,
                cwd=REPO,
                timeout=timeout_s,
            )
            stdout, stderr = r.stdout, r.stderr
        except subprocess.TimeoutExpired as e:
            stdout = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
            stderr = f"timeout after {timeout_s}s"
        rec = None
        for line in stdout.splitlines():
            if line.startswith("ISOLATION_JSON "):
                rec = json.loads(line[len("ISOLATION_JSON "):])
        if rec is None:
            rec = {"query": name, "error": (stderr or "no output")[-500:]}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"metric": "isolation", "results": results}))


if __name__ == "__main__":
    main()
