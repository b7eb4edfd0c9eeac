#!/usr/bin/env bash
# Cluster launch path (north rule: "spark-submit --py-files on
# multi-executor clusters at N and 4N executors").
#
# Packages the engine as a zip and submits tools/run_pagerank.py. In this
# sandbox --master defaults to local[$SPARK_GRAFT_CPUS]; on a real cluster
# pass e.g.:
#   MASTER=yarn EXECUTORS=64 tools/submit.sh /data/corpus /ckpt/run1
#   MASTER=yarn EXECUTORS=256 tools/submit.sh /data/corpus /ckpt/run1   # 4N
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
EXECUTORS="${EXECUTORS:-}"
SF_DIR="${1:-${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}}"
CKPT="${2:-/tmp/pg_spark_ckpt}"

ZIP="$(mktemp -d)/paragrapher_spark.zip"
(cd . && zip -qr "$ZIP" paragrapher_spark -x '*__pycache__*')

EXEC_ARGS=()
if [[ -n "$EXECUTORS" ]]; then
  EXEC_ARGS+=(--num-executors "$EXECUTORS")
fi

exec spark-submit \
  --master "$MASTER" \
  "${EXEC_ARGS[@]}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --py-files "$ZIP" \
  tools/run_pagerank.py "$SF_DIR" "$CKPT"
