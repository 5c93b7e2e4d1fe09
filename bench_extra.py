#!/usr/bin/env python
"""Per-query isolation bench + plan capture (guide §1.4/§1.5).

bench.py is FROZEN for measurement; this sidecar times individual
queries with the noop sink under the same session profile, optionally
dumping .explain("formatted") to a directory, so optimization work can
be measured and its plan claims pinned without touching the frozen
harness.

Usage:
  python bench_extra.py q1 q2 ...          # time the named queries
  python bench_extra.py --all              # whole registry
  REPS=3 PLANDIR=plans/r09 python bench_extra.py --explain q1 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("REPS", "3"))
# --explain captures .explain("formatted") for each query's first rep;
# PLANDIR overrides where the files land
PLANDIR = os.environ.get("PLANDIR", "")
if "--explain" in sys.argv and not PLANDIR:
    PLANDIR = "plans/r09"
SUFFIX = os.environ.get("PLAN_SUFFIX", "")


def main() -> None:
    import __spark_entry__ as entry_mod
    from nlquery_spark.plans import get_spark

    spark = get_spark("nlquery-bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    names = list(qs) if "--all" in sys.argv else args
    bad = [n for n in names if n not in qs]
    if bad:
        raise SystemExit(f"unknown queries: {bad}")

    # same warmup as bench.py's suite loop
    from pyspark.sql import functions as F

    _li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    _od = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    _li.groupBy("l_returnflag").agg(F.sum("l_quantity")).join(
        F.broadcast(_od.limit(100)), how="cross"
    ).write.format("noop").mode("overwrite").save()
    _od.limit(200).mapInPandas(lambda it: it, _od.schema).write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict[str, list[float]] = {}
    for name in names:
        runs = []
        for r in range(REPS):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            if r == 0 and PLANDIR:
                os.makedirs(PLANDIR, exist_ok=True)
                with open(
                    os.path.join(PLANDIR, f"{name}{SUFFIX}.txt"), "w"
                ) as fh:
                    fh.write(qs[name](spark, SF_DIR)._jdf.queryExecution()
                             .explainString(
                                 spark._jvm.org.apache.spark.sql.execution
                                 .ExplainMode.fromString("formatted")))
        spark.sparkContext.setJobDescription(None)
        out[name] = runs
    print(json.dumps({"sf_dir": SF_DIR, "reps": REPS, "load1": os.getloadavg()[0],
                      "runs": out}))
    spark.stop()


if __name__ == "__main__":
    main()
