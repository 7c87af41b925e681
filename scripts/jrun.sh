#!/bin/bash
# Direct-java runner for graft mains: same JVM flags as build.sbt's fork,
# but no sbt lock — lets Explain/Profile/Bench run while sbt test runs.
# Usage: scripts/jrun.sh <MainClass> [args...]   (env passes through)
set -euo pipefail
CP_FILE=${CP_FILE:-/tmp/cp.txt}
if [ ! -s "$CP_FILE" ]; then
  (cd /root/repo && sbt -batch 'export Compile/fullClasspath' 2>/dev/null | tail -1 > "$CP_FILE")
fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$(cat "$CP_FILE")" "$@"
