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
  # java.io.tmpdir gets its own RUN-SCOPED subdir inside the first override
  # entry, trap-deleted on exit: graft temp dirs (graft-derived-*,
  # graft-drain-*, graft-ckpt-*) land there, and a run killed before JVM
  # shutdown hooks fire (the OOM-kill scenario these benches hit) must not
  # leave them accumulating in the user's shuffle dir. The override entries
  # themselves are only handed to SPARK_LOCAL_DIRS — never deleted.
  SCRATCH=$(mktemp -d "${_dirs[0]}/graft-bench-tmp-XXXX")
  trap 'rm -rf "$SCRATCH"' EXIT
  export SPARK_LOCAL_DIRS="$BENCH_LOCAL_DIRS"
else
  SCRATCH=$(mktemp -d "${BENCH_SCRATCH_ROOT:-/dev/shm}/graft-bench-XXXX")
  trap 'rm -rf "$SCRATCH"' EXIT
  export SPARK_LOCAL_DIRS="$SCRATCH"
fi
# Aggressive periodic GC: shuffle files are deleted by the ContextCleaner
# only after the shuffle dependency is GC'd — with tmpfs scratch those
# dead files are RAM, so the default 30-min cadence can OOM a long pass.
# -Xms=-Xmx + AlwaysPreTouch: fault the whole heap in at JVM start (outside
# any measured pass). Without it, the first pass that grows the heap by tens
# of GB stalls 2-5 MINUTES in the kernel — 32 mutator threads page-faulting
# fresh heap serialize on mmap_lock (measured: replay_dedup passes
# 36/161/24/26/25/27 s — the one mid-growth pass is 6x; vmstat showed
# sys=60-90% for its duration with steal=0). BENCH_PRETOUCH=0 opts out.
# Pretouch physically commits the whole heap at JVM start — on a box with
# less free RAM than the heap that is an instant OOM-kill where the lazy
# -Xmx-only config survived. Gate the DEFAULT on MemAvailable (heap + 4 GB
# headroom); an explicit BENCH_PRETOUCH=1/0 always wins.
PRETOUCH=""
if [ "${BENCH_PRETOUCH:-auto}" != "0" ]; then
  _xmx="${BENCH_XMX:-96g}"
  # Parse any k/m/g/t-suffixed size (the old arithmetic only handled g/G:
  # BENCH_XMX=98304m left _xmx_kb unset and the later $(( )) aborted the
  # run under set -u). An unparseable value or a kernel without
  # MemAvailable skips the auto-pretouch rather than failing the bench.
  _xmx_kb=$(echo "$_xmx" | awk 'match($0, /^[0-9]+/) {
    n = substr($0, 1, RLENGTH); sfx = tolower(substr($0, RLENGTH+1, 1));
    if (sfx == "k") print n; else if (sfx == "m") print n * 1024;
    else if (sfx == "g") print n * 1024 * 1024;
    else if (sfx == "t") print n * 1024 * 1024 * 1024;
    else if (sfx == "") print int(n / 1024); }')
  _avail_kb=$(awk '/MemAvailable/ {print $2}' /proc/meminfo)
  if [ "${BENCH_PRETOUCH:-}" = "1" ] || { [ -n "$_xmx_kb" ] && [ -n "$_avail_kb" ] \
      && [ "$_avail_kb" -ge $(( _xmx_kb + 4194304 )) ]; }; then
    PRETOUCH="-Xms${_xmx} -XX:+AlwaysPreTouch"
  fi
fi
java $JOPTS -Xmx${BENCH_XMX:-96g} $PRETOUCH -Djava.io.tmpdir="$SCRATCH" \
  -Dspark.cleaner.periodicGC.interval="${BENCH_GC_INTERVAL:-90s}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "${MAIN:-graft.Bench}" "$@"
