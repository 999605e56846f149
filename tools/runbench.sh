#!/bin/bash
# Local bench runner mirroring the driver: local[32], sf from $1 (default 0.1).
# Usage: tools/runbench.sh [sfdir] [extra java props...]
set -u
SF="${1:-/root/testdata/sf0.1}"
JAR=/root/repo/target/scala-2.13/xgboostspark_2.13-0.1.0.jar
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"; done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"; done
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-32g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "${@:2}" \
  -cp "/opt/spark/jars/*:$JAR" graft.Bench
