#!/bin/bash
# Interleaved commit A/B for the driver bench (the BENCH_AB_r09 protocol):
# alternate fresh-JVM graft.Bench sessions of two COMMITTED, pre-built
# trees on the same box, position-balanced (first half A-first, second
# half B-first), each arm running its own tree's committed harness. The
# JVM launch is inlined (not the tree's run_tool.sh — older trees predate
# it): same add-opens set, per-process warehouse, UTC session.
# Usage: bench_ab.sh <treeA> <labelA> <treeB> <labelB> <rounds> <out.jsonl>
# Env passthrough: SPARK_DRIVER_MEM (default 96g), SPARK_GRAFT_SF_DIR
# (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS (default 32).
set -euo pipefail
A=$1; LA=$2; B=$3; LB=$4; N=$5; OUT=$6
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run_arm () {
  local tree=$1 label=$2 round=$3
  echo "[ab] $(date +%H:%M:%S) round $round arm $label ($tree)" >&2
  local line
  line=$( java $OPENS \
      -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC \
      -Dspark.sql.warehouse.dir="/tmp/graft_wh_ab_$$_${label}_${round}" \
      -Xmx"${SPARK_DRIVER_MEM:-96g}" \
      -cp "$tree/target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.Bench 2>/dev/null | grep '"metric"' )
  printf '{"arm":"%s","round":%s,"bench":%s}\n' "$label" "$round" "$line" >> "$OUT"
}
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
for r in $(seq 1 "$N"); do
  half=$(( (N + 1) / 2 ))
  if [ "$r" -le "$half" ]; then
    run_arm "$A" "$LA" "$r"; run_arm "$B" "$LB" "$r"
  else
    run_arm "$B" "$LB" "$r"; run_arm "$A" "$LA" "$r"
  fi
done
echo "[ab] done -> $OUT" >&2
