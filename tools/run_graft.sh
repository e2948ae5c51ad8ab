#!/bin/bash
# Run a graft main class against the compiled classes without sbt (avoids
# the sbt target lock and ~20 s of launcher overhead per invocation).
# Usage: tools/run_graft.sh <MainClass> [args...]
# Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, JVM_MEM (default 8g) pass through.
set -euo pipefail
CLS="$1"; shift
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADDOPENS ${JVM_EXTRA:-} \
  -Xmx"${JVM_MEM:-8g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$REPO/target/scala-2.13/classes:/opt/spark/jars/*" \
  "graft.$CLS" "$@"
