#!/bin/bash
# Run a graft main class with the same JVM options sbt's `run / fork`
# applies (Spark 4.x on JDK 17 needs the add-opens set when SparkSession
# is created outside spark-submit — without java.base/sun.util.calendar,
# date-column row decodes die with EXPRESSION_DECODING_FAILED, which is
# how round 10 discovered a bare `java -cp` verify run "fails" q82).
# Usage: tools/run_java.sh [-Xmx…] graft.Bench|graft.Verify [args…]
set -euo pipefail
cd "$(dirname "$0")/.."
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -cp "target/scala-2.13/classes:/opt/spark/jars/*" $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC "$@"
