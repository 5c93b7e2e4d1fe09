#!/usr/bin/env bash
# Cluster launch line (north_rule): spark-submit --py-files with the
# library packaged as a zip. $SPARK_GRAFT_MASTER selects the cluster
# (yarn / k8s / spark://...); defaults to local[8] in this sandbox.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$REPO/dist"
# sources-only reproducible zip (make_archive swept in __pycache__
# bytecode, which zipimport can prefer over edited .py on executors)
(cd "$REPO" && python scripts/build_dist.py)
SPARK_SUBMIT="$(python -c 'import pyspark,os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"
# Driver memory: local[*] runs every executor thread inside the driver
# JVM, so the spark-submit DEFAULT of 1g is the binding constraint (the
# round-5 linkpred stage OOMed a 200k-page run at 1g: ~24M wedge rows
# across 8 threads plus localCheckpoint blocks). 8g is still <7% of
# this box; on a real cluster set executor memory instead.
exec "$SPARK_SUBMIT" \
  --master "${SPARK_GRAFT_MASTER:-local[8]}" \
  --driver-memory "${SPARK_GRAFT_DRIVER_MEM:-8g}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_SHUFFLE_PARTITIONS:-32}" \
  --conf spark.ui.enabled=false \
  --py-files "$REPO/dist/nlquery_spark.zip" \
  "$REPO/scripts/submit_pipeline.py" "$@"
