#!/usr/bin/env bash
# Fast runner: java directly against /opt/spark/jars + compiled classes
# (skips sbt fork overhead). Usage: scripts/run.sh <mainClass> [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:target/scala-2.13/test-classes:/opt/spark/jars/*"
ADD_OPENS=(
  java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect
  java.base/java.io java.base/java.net java.base/java.nio java.base/java.util
  java.base/java.util.concurrent java.base/java.util.concurrent.atomic
  java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar
)
OPENS=()
for p in "${ADD_OPENS[@]}"; do OPENS+=(--add-opens "$p=ALL-UNNAMED"); done
SCALA_JARS=$(ls /root/.sbt/boot/scala-2.13*/lib/scala-library.jar 2>/dev/null | head -1 || true)
if [ -n "$SCALA_JARS" ]; then CP="$CP:$SCALA_JARS"; fi
exec java "${OPENS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$@"
