#!/usr/bin/env bash
# Cluster deployment example (north rule: spark-submit --py-files on a
# multi-executor cluster). Locally, `python -m htm_streamer_spark.cli`
# runs the same commands on local[*].
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="/tmp/htm_streamer_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" htm_streamer_spark)

TABLE="${1:?usage: submit_example.sh <table-path> <checkpoint-path>}"
CKPT="${2:?usage: submit_example.sh <table-path> <checkpoint-path>}"

# shuffle.partitions: ~2-3x total executor cores; AQE coalesces excess
spark-submit \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.shuffle.partitions=2000 \
  "$REPO/htm_streamer_spark/cli.py" \
  validate --table "$TABLE" --checkpoint "$CKPT"
