#!/bin/bash
# spark-submit deployment: zip the package, ship via --py-files.
# Usage: tools/submit.sh [--master local[8]] <run_pipeline.py args...>
set -euo pipefail
cd "$(dirname "$0")/.."
ZIP=/tmp/rdf_canonize_spark.zip
rm -f "$ZIP"
python3 -m zipfile -c "$ZIP" rdf_canonize_spark
MASTER="local[8]"
if [[ "${1:-}" == "--master" ]]; then
  MASTER="$2"; shift 2
fi
exec spark-submit --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$ZIP" \
  tools/run_pipeline.py "$@"
