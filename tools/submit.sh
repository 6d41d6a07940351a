#!/usr/bin/env bash
# Cluster deployment entry: package the engine and launch the KG
# pipeline via `spark-submit --py-files`, the path the pipeline takes
# on a real multi-executor cluster (BASELINE north_rule).  On a
# cluster, set SPARK_MASTER to the cluster master (yarn, k8s://...,
# spark://...); executors receive the code through the --py-files zip.
#
# Usage:
#   tools/submit.sh                      # defaults: local[8], 2000 pages
#   SPARK_MASTER=local[32] PAGES=60000 tools/submit.sh --force
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/arachne_spark.zip
rm -f "$ZIP"
python -m zipfile -c "$ZIP" arachne_spark

exec spark-submit \
  --master "${SPARK_MASTER:-local[8]}" \
  --conf spark.ui.enabled=false \
  --py-files "$ZIP" \
  arachne_spark/pipeline.py \
  --pages "${PAGES:-2000}" \
  --warehouse "${WAREHOUSE:-/tmp/arachne_warehouse_submit}" \
  "$@"
