#!/bin/bash
# One round of the interleaved commit A/B (see bench_ab.sh): runs arm A
# then arm B in fresh JVMs, or B then A when the 7th arg is "swap".
# Usage: bench_ab_round.sh <treeA> <labelA> <treeB> <labelB> <round> <out.jsonl> [swap]
set -euo pipefail
A=$1; LA=$2; B=$3; LB=$4; R=$5; OUT=$6; ORDER=${7:-}
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run_arm () {
  local tree=$1 label=$2
  echo "[ab] $(date +%H:%M:%S) round $R arm $label ($tree)" >&2
  local line
  line=$( java $OPENS \
      -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC \
      -Dspark.sql.warehouse.dir="/tmp/graft_wh_ab_$$_${label}_${R}" \
      -Xmx"${SPARK_DRIVER_MEM:-96g}" \
      -cp "$tree/target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.Bench 2>/dev/null | grep '"metric"' )
  printf '{"arm":"%s","round":%s,"bench":%s}\n' "$label" "$R" "$line" >> "$OUT"
}
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
if [ "$ORDER" = "swap" ]; then run_arm "$B" "$LB"; run_arm "$A" "$LA"
else run_arm "$A" "$LA"; run_arm "$B" "$LB"; fi
