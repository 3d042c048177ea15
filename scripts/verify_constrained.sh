#!/usr/bin/env bash
# Spill-safety evidence run: the full query suite in a memory-constrained
# JVM. A 100 TB cluster run depends on every sort/aggregate/shuffle
# degrading to EXTERNAL (spilled) execution when data outgrows executor
# memory — this run forces exactly that at sf0.1 by shrinking the heap
# and Spark's memory fraction until the suite must spill, then checks the
# results are hash-identical to the oracle (scripts/selfcheck.py).
#
#   scripts/verify_constrained.sh [sfDir] [outDir] [heap]
#
# Defaults: /root/testdata/sf0.1 /tmp/verify_constrained 1g.
# Exit 0 = every query completed (no OOM). Correctness is checked by the
# caller running selfcheck.py on outDir (see BENCH_NOTES.md for the
# recorded round-5 run).
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.1}"
OUT_DIR="${2:-/tmp/verify_constrained}"
HEAP="${3:-1g}"

# Direct java launch — sbt would interpose its own (large) heap. The
# unmanaged Spark distribution jars carry scala-library.
CP="target/scala-2.13/classes:/opt/spark/jars/*"

# The squeeze: 8 worker threads sharing a unified memory pool of
# (heap - 300M) * fraction 0.05 — ~2.3 MB minimum per concurrent task at
# -Xmx1g, far below the suite's per-task working sets at sf0.1, so
# sorts, hash aggregates, and shuffle writers must spill to disk.
# storageFraction stays at its 0.5 DEFAULT since round 6: the iterative
# operators (CC, PageRank) used to OOM here (UNABLE_TO_ACQUIRE_MEMORY in
# neardup_clusters) because their localCheckpoint state sat in the
# protected storage region and starved execution below the
# hash-aggregate page floor; they now pin loop state DISK_ONLY, so the
# lesson lives in the operators, not in deployment config (history in
# BENCH_NOTES.md / PLANS.md).
# Concurrency is 4, not 8: a new hash-aggregate map's FIRST page (256 KB)
# cannot reclaim memory from other TASKS' consumers, so at full pool
# saturation the first-page grab is a cross-task race — 4 tasks × 9 MB
# shares make completion deterministic; per-task pressure (and spill
# volume, ~450 MB over the 8 smoke queries) stays real.
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-4}" \
SPARK_GRAFT_EXTRA_CONF="spark.memory.fraction=0.05;spark.sql.autoBroadcastJoinThreshold=1048576" \
java -Xmx"$HEAP" -XX:+ExitOnOutOfMemoryError \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -cp "$CP" graft.Verify "$SF_DIR" "$OUT_DIR"
