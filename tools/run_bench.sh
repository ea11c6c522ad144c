#!/bin/bash
# Run graft.Bench (or any graft main) outside sbt, replicating build.sbt's
# fork javaOptions, against a class snapshot so concurrent sbt compiles
# don't disturb a running bench.
#   tools/run_bench.sh [classesDir] [mainClass]
# Env passthrough: SPARK_GRAFT_* knobs as in build.sbt/Bench.scala.
set -euo pipefail
CLASSES="${1:-/tmp/bench_classes}"
MAIN="${2:-graft.Bench}"
# consume the two positionals so "$@" below is ONLY the main's own args
shift $(( $# > 2 ? 2 : $# ))
MEM="${SPARK_DRIVER_MEM:-32g}"
case "$MEM" in
  *[gG]) MB=$(( ${MEM%?} * 1024 ));;
  *[mM]) MB=${MEM%?};;
  *) MB=$(( MEM / 1024 / 1024 ));;
esac
GCT="${SPARK_GRAFT_GC_THREADS:-16}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"$MEM" -Xmn"$(( MB / 2 ))m" \
  -XX:ParallelGCThreads="$GCT" -XX:+UseParallelGC \
  ${SPARK_GRAFT_JVM_OPTS:-} \
  -cp "$CLASSES:/opt/spark/jars/*" "$MAIN" "$@"
