#!/bin/bash
# Direct-java bench runner (skips sbt startup; same JVM flags as build.sbt).
# Usage: scripts/run_bench.sh [extra env via environment]
set -e
cd /root/repo
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
exec java $ADDOPENS -Xmx${SPARK_DRIVER_MEM:-32g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp target/scala-2.13/classes:/opt/spark/jars/\* "${GRAFT_MAIN:-graft.Bench}" "$@"
