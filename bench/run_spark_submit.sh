#!/usr/bin/env bash
# North-rule execution mode: package the engine and run the benchmark via
# spark-submit --py-files (the cluster deployment path; local[N] here).
#
#   bench/run_spark_submit.sh [cpus] [sf_dir]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CPUS="${1:-${SPARK_GRAFT_CPUS:-32}}"
SF_DIR="${2:-${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}}"

ZIP="$(mktemp -d)/demeter_spark.zip"
(cd "$REPO" && python -c "
import zipfile, os
with zipfile.ZipFile('$ZIP', 'w') as z:
    for root, _, files in os.walk('demeter_spark'):
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
")

SPARK_GRAFT_CPUS="$CPUS" SPARK_GRAFT_SF_DIR="$SF_DIR" \
  spark-submit --master "local[$CPUS]" --py-files "$ZIP" \
  --conf spark.ui.enabled=false \
  "$REPO/bench.py"
