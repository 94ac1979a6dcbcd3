#!/usr/bin/env bash
# Run a graft main class directly on the Spark-jars classpath, bypassing
# sbt (no build lock held, no sbt JVM): compile first with `sbt compile`,
# then e.g.
#   scripts/run_main.sh graft.Bench
#   scripts/run_main.sh graft.tools.ScaleUp /root/testdata/sf0.1 testdata-sf1 10
# Mirrors build.sbt's javaOptions (add-opens, codegen/codecache flags).
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="$1"; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -XX:-DontCompileHugeMethods \
  -XX:ReservedCodeCacheSize=1g \
  -XX:CICompilerCount=8 \
  -Dspark.sql.codegen.methodSplitThreshold=256 \
  ${SPARK_GRAFT_EXTRA_OPTS:-} \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
