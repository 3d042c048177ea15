#!/usr/bin/env bash
# Evidence run: the full 111-query Verify sweep under PROCESS-SEPARATED
# executors — local-cluster[2,4,2048] (2 executor JVMs x 4 cores), the
# closest single-machine stand-in for a real cluster. Everything the
# local[N] runs can hide crosses a process boundary here: task
# serialization of the custom Catalyst expressions, StageLevels'
# cross-executor capacity probe, BandJoin's cached stage tables,
# broadcast exchange transport, and the loop checkpoints.
#
# Usage: scripts/verify_local_cluster.sh [sfDir] [outDir]
# Then:  python3 scripts/selfcheck.py <sfDir> <outDir>
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-/tmp/verify_lc}"
rm -rf "$OUT_DIR"
sbt -batch package
JAR="$(ls target/scala-2.13/*.jar | head -1)"
# spark.jars ships the graft classes to the executor JVMs (they start
# from /opt/spark jars only). Executor memory 2 GiB: sf0.01 partitions
# are MBs; headroom is for parquet write buffers, not data volume.
# SPARK_SCALA_VERSION: the executor-launching command builder normally
# gets this from bin/load-spark-env.sh; under sbt nothing sets it and
# ExecutorRunner dies with "Cannot find any build directories".
SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER='local-cluster[2,4,2048]' \
SPARK_GRAFT_CPUS=8 \
SPARK_GRAFT_EXTRA_CONF="spark.jars=$JAR" \
  sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"
