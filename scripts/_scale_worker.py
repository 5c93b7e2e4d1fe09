#!/usr/bin/env python
"""Worker for the scaling benchmark: run the KG-extraction job at a given
parallelism in a fresh JVM and print one JSON line.

Usage: python scripts/_scale_worker.py <cpus> <n_pages>
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    n_pages = int(sys.argv[2])

    from nlquery_spark.operators.extract import dedup_triples, extract_triples
    from nlquery_spark.plans import get_spark
    from nlquery_spark.sources.pages import orders_schema_spec, synth_pages

    spark = get_spark(
        f"nlquery-scale-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    # identical input at every parallelism: generation is id-keyed;
    # partition count fixed independently of cpus
    pages = synth_pages(spark, n_pages, num_partitions=128).persist()
    n = pages.count()

    # warmup: full-width job so every python worker pays its imports and
    # recognizer compilation outside the timed window (limit() would only
    # warm one partition's worker)
    warm = synth_pages(spark, cpus * 100, num_partitions=cpus)
    dedup_triples(extract_triples(warm, [orders_schema_spec()])).count()

    best = None  # (full_wall, extract_wall) from the SAME iteration:
    # mixing best-of-3 stage times across iterations would misstate the
    # extract/shuffle split when noise lands on different passes.
    # Every extract_triples invocation auto-mints a fresh chunk-memo
    # namespace, so each timed pass starts with a cold memo (a repeat
    # over the same cached pages would otherwise measure the memo, not
    # the engine — and the warmup's pages share generator ids with the
    # corpus, so a shared namespace would pre-fill real corpus chunks)
    for _ in range(3):
        # per-stage breakdown: extraction alone (embarrassingly
        # parallel, no shuffle), then the full job (adds the one
        # dedup shuffle); the delta is the shuffle + agg cost
        t0 = time.time()
        extract_triples(pages, [orders_schema_spec()]).count()
        ext = time.time() - t0
        t0 = time.time()
        triples = dedup_triples(extract_triples(pages, [orders_schema_spec()]))
        n_triples = triples.count()
        wall = time.time() - t0
        if best is None or wall < best[0]:
            best = (wall, ext)
    wall, extract_wall = best
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_pages": n,
                "n_triples": n_triples,
                "wall_sec": round(wall, 3),
                "extract_only_sec": round(extract_wall, 3),
                "dedup_shuffle_sec": round(max(wall - extract_wall, 0.0), 3),
                "pages_per_sec": round(n / wall, 1),
                "triples_per_sec": round(n_triples / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
