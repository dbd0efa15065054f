#!/bin/bash
# Focused bench: time a comma-separated list of query-name prefixes with
# the exact driver methodology (Bench main, local[$SPARK_GRAFT_CPUS],
# n runs, median). Usage: tools/bench_focus.sh q199,q209 [runs] [sfDir]
# Prints the Bench JSON line; full record lands in BENCH_LAST.json.
set -e
ONLY="$1"; RUNS="${2:-3}"; SF="${3:-/root/testdata/sf0.1}"
cd /root/repo
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_BENCH_ONLY="$ONLY" SPARK_GRAFT_BENCH_RUNS="$RUNS" \
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-8g} \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench
