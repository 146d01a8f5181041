#!/usr/bin/env bash
# Cluster submission (north_rule: "runs via spark-submit --py-files on
# multi-executor clusters at N and 4N executors").
#
# Usage: scripts/submit.sh <master-url> <num-executors> [job-args...]
#   e.g. scripts/submit.sh yarn 256 --sf-dir s3://bucket/corpus
#
# The engine is a pure-Python package: one zip is the whole deployment.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${1:?master url}"
EXECUTORS="${2:?num executors}"
shift 2

ZIP="$(mktemp -d)/demeter_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" demeter_spark -x "*__pycache__*")

exec spark-submit \
  --master "$MASTER" \
  --num-executors "$EXECUTORS" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.shuffle.partitions=$((EXECUTORS * 4)) \
  --py-files "$ZIP" \
  "$REPO/scripts/run_flagship.py" "$@"
