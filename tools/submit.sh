#!/usr/bin/env bash
# Package the engine and run the full pipeline via spark-submit --py-files.
#   tools/submit.sh <input> <rules.yml> <output> [extra spark-submit args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
INPUT="$1"; RULES="$2"; OUTPUT="$3"; shift 3 || true

ZIP="$(mktemp -d)/odinson_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" odinson_spark -x '*__pycache__*')

exec spark-submit \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "$@" \
  "$REPO/tools/run_pipeline.py" \
  --input "$INPUT" --rules "$RULES" --output "$OUTPUT"
