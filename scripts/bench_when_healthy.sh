#!/bin/bash
# Poll the host window with graft.tools.WindowProbe (the cpu/par axes the
# dd-only probe cannot see) and run the full-surface bench the moment a
# committed tier matches with its par band green. Motivation: the
# round-11 evening's three full-bench attempts each burned ~12 minutes
# inside builder-contention windows (cpu 434-454 at io 304-381) that a
# ~5-second probe would have rejected up front; Bench's own pre-flight
# retry loop only spans minutes, while contention windows persist hours.
#
# Usage: scripts/bench_when_healthy.sh [jar] [poll_sleep_sec] [max_polls]
# Runs the bench at most once, then exits with Bench's exit code; exits
# 3 if max_polls elapse without a healthy window (no bench attempted —
# a deliberate contrast with Bench's measure-and-quarantine: this script
# exists to SPEND a healthy window, Bench exists to never refuse the
# driver's scheduled measurement).
set -u
JAR="${1:-/dev/shm/graft-campaign.jar}"
SLEEP="${2:-300}"
MAX="${3:-60}"
CP="$JAR:/opt/spark/jars/*"
AO="--add-opens java.base/java.lang=ALL-UNNAMED \
 --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
 --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
 --add-opens java.base/java.io=ALL-UNNAMED \
 --add-opens java.base/java.net=ALL-UNNAMED \
 --add-opens java.base/java.nio=ALL-UNNAMED \
 --add-opens java.base/java.util=ALL-UNNAMED \
 --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
 --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
 --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
 --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
 --add-opens java.base/sun.security.action=ALL-UNNAMED \
 --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

n=0
while true; do
  n=$((n + 1))
  echo "== $(date -u +%FT%TZ) probe $n/$MAX"
  if java $AO -cp "$CP" graft.tools.WindowProbe; then
    echo "== $(date -u +%FT%TZ) healthy window — running full bench"
    SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
    SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
      java $AO -Xmx8g -cp "$CP" graft.Bench
    rc=$?
    echo "== $(date -u +%FT%TZ) bench done rc=$rc"
    exit $rc
  fi
  [ "$n" -ge "$MAX" ] && { echo "== no healthy window in $MAX polls"; exit 3; }
  sleep "$SLEEP"
done
