#!/bin/bash
# Run a graft main class directly from compiled classes + /opt/spark/jars,
# bypassing sbt — long sweeps then don't hold the sbt project lock.
# Usage: tools/jrun.sh <mainClass> [args...]   (env: SPARK_DRIVER_MEM=8g)
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS $EXTRA_JVM -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp /root/repo/target/scala-2.13/classes:'/opt/spark/jars/*' "$@"
