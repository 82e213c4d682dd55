#!/bin/bash
# Run graft.Bench (or another graft main via $MAIN) straight from the
# compiled classes — sbt holds a global lock, so timed runs launched this
# way can't collide with a concurrent test compile. Usage:
#   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_QUERIES=... scripts/bench.sh
# Defaults mirror the driver protocol: local[32], repeat=2 pass-min.
set -u
cd "$(dirname "$0")/.."
JOPTS="--add-opens=java.base/java.lang=ALL-UNNAMED
--add-opens=java.base/java.lang.invoke=ALL-UNNAMED
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED
--add-opens=java.base/java.io=ALL-UNNAMED
--add-opens=java.base/java.net=ALL-UNNAMED
--add-opens=java.base/java.nio=ALL-UNNAMED
--add-opens=java.base/java.util=ALL-UNNAMED
--add-opens=java.base/java.util.concurrent=ALL-UNNAMED
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
--add-opens=java.base/sun.nio.ch=ALL-UNNAMED
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED
--add-opens=java.base/sun.security.action=ALL-UNNAMED
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED
-Djdk.reflect.useDirectMethodHandle=false"
# Shuffle scratch + temp default to tmpfs: the round-12 box's BUFFERED disk
# writes ran at ~16 MB/s (pathological writeback throttling), which turned
# every shuffle-heavy stage into an IO crawl; tmpfs measured 141 MB/s.
# CAVEAT — tmpfs is RAM: a shuffle-heavy build (the 5M-doc banding agg
# writes tens of GB of scratch) plus a ${BENCH_XMX:-96g} heap can exceed
# physical memory and get the JVM kernel-killed (observed round 13, exit
# 137). On a box with healthy buffered writes, set BENCH_SCRATCH_ROOT to a
# disk path for those runs — disk scratch is reclaimable page cache, not
# pinned RAM. The scratch is deleted when the run exits.
# BENCH_LOCAL_DIRS (comma-separated) spreads shuffle scratch across several
# devices — e.g. tmpfs + disk — for builds whose peak scratch exceeds any
# single one (Spark round-robins blocks across local dirs). Each entry is
# validated up front (a typo'd path would otherwise fail minutes later
# inside Spark's DiskBlockManager), and the mktemp'd scratch is skipped
# entirely when the override is present — but java.io.tmpdir still needs a
# writable home, so it falls to the first override entry.
if [ -n "${BENCH_LOCAL_DIRS:-}" ]; then
  IFS=',' read -ra _dirs <<< "$BENCH_LOCAL_DIRS"
  for d in "${_dirs[@]}"; do
    [ -d "$d" ] || { echo "bench.sh: BENCH_LOCAL_DIRS entry '$d' is not a directory" >&2; exit 2; }
  done
  SCRATCH="${_dirs[0]}"
  export SPARK_LOCAL_DIRS="$BENCH_LOCAL_DIRS"
else
  SCRATCH=$(mktemp -d "${BENCH_SCRATCH_ROOT:-/dev/shm}/graft-bench-XXXX")
  trap 'rm -rf "$SCRATCH"' EXIT
  export SPARK_LOCAL_DIRS="$SCRATCH"
fi
# Aggressive periodic GC: shuffle files are deleted by the ContextCleaner
# only after the shuffle dependency is GC'd — with tmpfs scratch those
# dead files are RAM, so the default 30-min cadence can OOM a long pass.
java $JOPTS -Xmx${BENCH_XMX:-96g} -Djava.io.tmpdir="$SCRATCH" \
  -Dspark.cleaner.periodicGC.interval="${BENCH_GC_INTERVAL:-90s}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "${MAIN:-graft.Bench}" "$@"
