#!/usr/bin/env bash
# Cluster launch line (north_rule): spark-submit --py-files with the
# library packaged as a zip. $SPARK_GRAFT_MASTER selects the cluster
# (yarn / k8s / spark://...); defaults to local[8] in this sandbox.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$REPO/dist"
(cd "$REPO" && python -c "import shutil; shutil.make_archive('dist/nlquery_spark', 'zip', root_dir='.', base_dir='nlquery_spark')")
SPARK_SUBMIT="$(python -c 'import pyspark,os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"
exec "$SPARK_SUBMIT" \
  --master "${SPARK_GRAFT_MASTER:-local[8]}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_SHUFFLE_PARTITIONS:-32}" \
  --conf spark.ui.enabled=false \
  --py-files "$REPO/dist/nlquery_spark.zip" \
  "$REPO/scripts/submit_pipeline.py" "$@"
