#!/bin/bash
# Launch a graft main class directly with java, bypassing the sbt project
# lock so long-running probes/benches can overlap sbt test runs.
# Usage: SPARK_GRAFT_...=... scripts/run_main.sh graft.Bench [args...]
# Mirrors build.sbt's run/javaOptions (JDK17 add-opens + driver Xmx).
set -euo pipefail
MAIN="$1"; shift
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$MAIN" "$@"
