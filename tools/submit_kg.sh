#!/usr/bin/env bash
# spark-submit --py-files launch of the KG build (north_rule: "run via
# spark-submit --py-files ... at two cluster sizes").
#
#   tools/submit_kg.sh <cores> <rows>
#
# Builds the package zip, then spark-submits tools/kg_run.py with the
# zip on --py-files. In the sandbox the "cluster size" is local[N];
# on a real cluster, swap --master/--num-executors and keep the rest.
set -euo pipefail
CORES="${1:-8}"
ROWS="${2:-200000}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"

ZIP=$(python - <<PY
import sys
sys.path.insert(0, "$REPO")
from deja_view_spark.deploy import build_zip
print(build_zip())
PY
)

MEM=$(( CORES / 2 > 8 ? CORES / 2 : 8 ))g

exec spark-submit \
  --master "local[$CORES]" \
  --driver-memory "$MEM" \
  --conf spark.sql.shuffle.partitions="$(( CORES * 4 ))" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.ui.enabled=false \
  --py-files "$ZIP" \
  "$REPO/tools/kg_run.py" --cores "$CORES" --rows "$ROWS"
