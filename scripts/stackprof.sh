#!/usr/bin/env bash
# Poor-man's flame profile for a running graft main: samples the forked JVM's
# executor threads with jstack and histograms the hottest frames.
#
# This recipe found round 13's biggest win: the q176 "~130x at 100x" session
# cost attributed to shuffle volume was actually one quadratic iterator —
# 85% of sampled frames sat in insertSpan's rangeTo scan. Histogram first,
# theorize second.
#
# Usage:
#   1. start the workload:  SPARK_GRAFT_SF_DIR=... sbt "runMain graft.JobProfile qNNN" &
#   2. once tasks are running:  scripts/stackprof.sh [samples=6] [interval_s=3]
#
# The forked JVM is found via jps (sbt runMain forks; the main's class name
# shows up directly — sbt-launch.jar is excluded).
set -euo pipefail
SAMPLES=${1:-6}
INTERVAL=${2:-3}

PID=$(jps | grep -vE "sbt-launch|Jps" | awk '{print $1}' | head -1)
[[ -n "$PID" ]] || { echo "no forked JVM found (is the workload running?)"; exit 1; }
echo "sampling pid $PID ($(jps | grep "^$PID " | cut -d' ' -f2-)) ${SAMPLES}x every ${INTERVAL}s"

TMP=$(mktemp)
trap 'rm -f "$TMP"' EXIT
for i in $(seq 1 "$SAMPLES"); do
  jstack "$PID" | grep -A 14 '"Executor task launch' | grep -E "^\s+at " >> "$TMP" || true
  sleep "$INTERVAL"
done

echo "=== hottest frames (count, frame) ==="
sort "$TMP" | uniq -c | sort -rn | head -25
