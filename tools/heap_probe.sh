#!/bin/bash
# OOM-cliff probe (round-10 verdict item 7): run the top peak-heap
# query families at the sf1.0 tree under a shrinking -Xmx and report
# pass/fail per heap size — the minimum-heap row for SCALE.md.
#
# The family list is the ScaleGate peak-heap table's top 10; Bench's
# ONLY filter selects them, 32 threads to match the certified decade-up
# configuration (memory pressure scales with task concurrency).
#
# Usage: tools/heap_probe.sh 16g 12g 8g 6g 4g
set -u
# default = the round-11 warm-run peak-heap top 10 (SCALE.md table)
HEAVY=${HEAVY:-q178,q180,q74,q69,q86,q68,q73,q67,q66,q72}
SF=${SF:-target/scale/sf1.0}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

echo "| heap | outcome | failures |"
echo "|---|---|---|"
for MEM in "$@"; do
  LOG=/tmp/heapprobe_$MEM.log
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_BENCH_RUNS=1 \
  SPARK_GRAFT_BENCH_ONLY=$HEAVY SPARK_GRAFT_CPUS=32 \
  java $OPENS -Xmx$MEM -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench \
    >"$LOG" 2>&1
  rc=$?
  # Bench marks per-query failures in its JSON; an OOM can also kill
  # the JVM outright (nonzero exit, no JSON)
  fails=$(grep -o '"failures":{[^}]*}' "$LOG" | tail -1)
  if [ $rc -ne 0 ]; then
    echo "| $MEM | JVM DIED (rc=$rc) | $(grep -m1 -i 'OutOfMemory\|Killed' "$LOG" | cut -c1-80) |"
  elif [ "$fails" != '"failures":{}' ]; then
    echo "| $MEM | query failures | ${fails:0:120} |"
  else
    total=$(grep -o '"value":[0-9.]*' "$LOG" | head -1)
    echo "| $MEM | PASS ($total sec) | - |"
  fi
done
