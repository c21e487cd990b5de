#!/bin/bash
# Run graft.Bench (or GRAFT_MAIN) directly on the compiled classes (no
# sbt overhead).
# Usage: tools/run_bench.sh [sfdir] [extra program args...]
#   env: SPARK_GRAFT_ONLY, SPARK_DRIVER_MEM, GRAFT_MAIN
# Extra args go to the main verbatim, e.g.
#   GRAFT_MAIN=graft.Verify tools/run_bench.sh /root/testdata/sf0.01 \
#     /root/testdata/sf0.01 /tmp/verify_out
set -euo pipefail
export SPARK_GRAFT_SF_DIR="${1:-/root/testdata/sf0.1}"
shift $(( $# > 0 ? 1 : 0 ))
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# -Xms=-Xmx + AlwaysPreTouch: commit and fault the whole heap at JVM
# start, OUTSIDE any timed window. Without it the first heavy query in
# a fresh JVM grows the heap live and pays the kernel's page-fault /
# THP path inside its timing (r13 measured: q48 first-run 99 s at
# sys 0.75 and 6x thread-CPU, settling to 12 s once the heap was
# grown; same signature as the in-suite single-slot storms).
# GRAFT_JAVA_OPTS: extra JVM flags for A/B experiments (e.g.
# -XX:ReservedCodeCacheSize=1g when probing code-cache pressure) —
# never set by the driver, empty by default.
exec java $ADD_OPENS ${GRAFT_JAVA_OPTS:-} \
  -Xms"${SPARK_DRIVER_MEM:-8g}" -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -XX:+AlwaysPreTouch \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}:/opt/spark/jars/*" \
  "${GRAFT_MAIN:-graft.Bench}" "$@" 2>/tmp/bench_stderr.log <<<""
