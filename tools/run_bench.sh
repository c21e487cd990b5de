#!/bin/bash
# Run graft.Bench (or GRAFT_MAIN) directly on the compiled classes (no
# sbt overhead).
# Usage: tools/run_bench.sh [sfdir]
#   env: SPARK_GRAFT_ONLY, SPARK_DRIVER_MEM, GRAFT_MAIN
set -euo pipefail
export SPARK_GRAFT_SF_DIR="${1:-/root/testdata/sf0.1}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "${GRAFT_MAIN:-graft.Bench}" 2>/tmp/bench_stderr.log <<<""
