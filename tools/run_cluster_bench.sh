#!/bin/bash
# Scaling evidence under REAL separate executor JVMs, launched via
# spark-submit — the north rule's cluster shape ("run via spark-submit ...
# between N and 4N executor clusters"): graft.Bench with
# SPARK_GRAFT_LOCAL_CLUSTER=1 runs the same flagship pair on
# local-cluster[W,4,mem] masters, W=1 (narrow) vs W=4 (wide). Spark's
# standalone Worker/ExecutorRunner path forks one executor JVM per worker
# (4 cores, 12g heap each), shuffle goes through netty between processes,
# and the app classes reach executors via the spark-submit-shipped jar.
#
#   sbt -batch package && tools/run_cluster_bench.sh
#
# Env passthrough: all SPARK_GRAFT_* knobs (BENCH_CONVS, BENCH_REPS, ...).
set -euo pipefail
JAR="${1:-target/scala-2.13/ocrspark_2.13-0.1.0.jar}"
export SPARK_HOME=/opt/spark
# keep daemon/executor scratch off the read-only install dir
export SPARK_LOG_DIR=/tmp/graft_spark_logs
export SPARK_WORKER_DIR=/tmp/graft_spark_work
export SPARK_LOCAL_DIRS=/tmp/graft_spark_local
mkdir -p "$SPARK_LOG_DIR" "$SPARK_WORKER_DIR" "$SPARK_LOCAL_DIRS"
export SPARK_GRAFT_LOCAL_CLUSTER=1
# scaling phase only (operator queries are thread-mode territory), and the
# corpus-materialization session should spin up 4 workers, not 8
export SPARK_GRAFT_BENCH_ONLY=1
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}"
# LocalSparkCluster's in-process Workers ignore SPARK_WORKER_DIR and put
# executor scratch (shipped jar + logs, ~1 MB/app) under SPARK_HOME/work —
# sweep it when the run ends so the install dir stays pristine
trap 'rm -rf /opt/spark/work' EXIT
# driver does planning + the in-process master/workers; executors do the work
/opt/spark/bin/spark-submit \
  --master "local[1]" \
  --class graft.Bench \
  --driver-memory "${SPARK_DRIVER_MEM:-8g}" \
  --driver-java-options "-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -XX:+UseParallelGC" \
  "$JAR"
