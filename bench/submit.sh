#!/usr/bin/env bash
# Cluster-style launch (north rule: "runs via spark-submit --py-files").
# Locally this wraps the same bench in spark-submit; on a real cluster
# swap --master for yarn/k8s and size executors via the env vars below.
#
#   N_CORES=8 ./bench/submit.sh          # one parallelism level
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
N_CORES="${N_CORES:-8}"
ZIP="$(mktemp -d)/gliner_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" gliner_spark)

exec spark-submit \
  --master "local[${N_CORES}]" \
  --py-files "$ZIP" \
  --conf spark.sql.shuffle.partitions="${N_CORES}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.python.worker.reuse=true \
  "$REPO/bench.py" --worker --cores "$N_CORES" \
  --sf-dir "${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  --queries kg_scale_job
