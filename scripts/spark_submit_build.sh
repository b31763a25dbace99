#!/usr/bin/env bash
# Package solr_spark and run the index build via spark-submit --py-files
# (the north rule's deployment shape). Local smoke:
#   scripts/spark_submit_build.sh --synth-docs 2000 --out /tmp/submit_idx
# Cluster: set SPARK_MASTER (e.g. yarn / spark://host:7077 / k8s://...).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${SPARK_MASTER:-local[8]}"
ZIP="${TMPDIR:-/tmp}/solr_spark_pyfiles.zip"

(cd "$REPO" && rm -f "$ZIP" && zip -qr "$ZIP" solr_spark -x '*__pycache__*')

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_SHUFFLE:-32}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$ZIP" \
  "$REPO/scripts/submit_build.py" "$@"
