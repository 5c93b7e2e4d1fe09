#!/usr/bin/env python
"""Build a FULL-SUITE sf1-equivalent dataset at /tmp/nlquery_sf1 so the
whole bench.py suite (not just the bench_sf1.py workload subset) can be
timed at 10x scale locally. Reuses scripts/bench_sf1.py::build_dataset
for documents/embeddings/orders/lineitem/dims and adds the events table
(10 deterministic copies, event_id offset k*10_000_000, user_id offset
k*1_000_000 so per-user structure scales instead of deepening).

Measurement-only helper for optimization rounds: the driver generates
its own sf1; nothing here feeds an oracle or a query result.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/nlquery_sf1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
COPIES = 10


def main() -> None:
    from pyspark.sql import functions as F

    import bench_sf1
    from nlquery_spark.plans import get_spark

    spark = get_spark(
        "make-sf1-suite", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench_sf1.DST = DST
    bench_sf1.build_dataset(spark)
    if not os.path.exists(os.path.join(DST, "events.parquet", "_SUCCESS")):
        ev = spark.read.parquet(f"{SRC}/events.parquet")
        out = None
        for k in range(COPIES):
            c = ev.withColumn(
                "event_id", F.col("event_id") + F.lit(k * 10_000_000)
            ).withColumn("user_id", F.col("user_id") + F.lit(k * 1_000_000))
            out = c if out is None else out.unionByName(c)
        out.repartition(CPUS).write.mode("overwrite").parquet(
            f"{DST}/events.parquet"
        )
    print("sf1 suite dataset ready at", DST)
    spark.stop()


if __name__ == "__main__":
    main()
