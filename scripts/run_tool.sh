#!/bin/bash
# Launch a graft main class in a fresh JVM with the same module options
# sbt's forked runs use (build.sbt jdk17AddOpens). Usage:
#   scripts/run_tool.sh <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g), SPARK_GRAFT_* passed through.
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# Per-process warehouse: tools and sbt-test JVMs otherwise share
# ./spark-warehouse, and two concurrent writers of the same managed
# table name (e.g. graft_idx_prefix from a soak AND a PlanSpec run)
# corrupt each other's _temporary commit dirs (measured: TASK_WRITE_FAILED
# chmod race). Stores are built and consumed within one JVM, so
# isolation costs nothing. Override with SPARK_GRAFT_WAREHOUSE.
WH="${SPARK_GRAFT_WAREHOUSE:-/tmp/graft_wh_$$}"
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dspark.sql.warehouse.dir="$WH" \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$@"
