#!/usr/bin/env bash
# Local verification of the spark-submit --py-files deployment path
# (north rule): zip the package, submit the crawl job against the synthetic
# corpus, print the crawl summary.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CORES="${SPARK_GRAFT_CPUS:-8}"
SF="${SPARK_GRAFT_SYNTH_SF:-0.001}"

CORPUS=$(python - <<PY
import sys; sys.path.insert(0, "$REPO")
from supercrawler_spark.sources.synth import ensure_corpus
print(ensure_corpus(float("$SF")))
PY
)

WORK=$(mktemp -d)
(cd "$REPO" && zip -qr "$WORK/supercrawler_spark.zip" supercrawler_spark -x '*__pycache__*')

spark-submit \
  --master "local[$CORES]" \
  --py-files "$WORK/supercrawler_spark.zip" \
  --conf spark.ui.enabled=false \
  --conf spark.sql.shuffle.partitions=$((2 * CORES)) \
  --conf spark.sql.adaptive.advisoryPartitionSizeInBytes=8m \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=256 \
  "$REPO/scripts/crawl_job.py" \
  --pages "$CORPUS/pages" \
  --seeds "$CORPUS/seeds.parquet" \
  --robots "$CORPUS/robots.parquet" \
  --store "$WORK/crawlstore" \
  --depth 2 --politeness --num-buckets 32
