#!/bin/sh
# Launch a graft main directly off the sbt-compiled classes, bypassing the
# sbt JVM (its logger/compile-check overhead adds noise to bench wall-times
# and its project lock blocks concurrent runs). Mirrors build.sbt's forked
# javaOptions: JDK-17 add-opens (Spark 4.x outside spark-submit) + UTC +
# headless UI. Usage: tools/run_main.sh graft.Bench [args...]
# Env knobs pass through (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, ...).
set -eu
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MAIN="$1"; shift
cd "$REPO"   # Scratch.root keys off the working directory
# Refuse to run stale classes (ADVICE r17): a source file newer than the
# compiled tree means this run would silently execute old code. Override
# with SPARK_GRAFT_ALLOW_STALE=1 (e.g. mid-edit benchmarking on purpose).
CLASSES="$REPO/target/scala-2.13/classes"
if [ "${SPARK_GRAFT_ALLOW_STALE:-}" != "1" ]; then
  # anchor on the newest compiled class, not the dir mtime (only direct
  # children bump a directory's mtime)
  NEWEST_CLASS=$(find "$CLASSES" -name '*.class' -printf '%T@ %p\n' 2>/dev/null \
    | sort -rn | head -1 | cut -d' ' -f2-)
  if [ -z "$NEWEST_CLASS" ]; then
    echo "run_main.sh: no compiled classes under $CLASSES — run 'sbt compile' first" >&2
    exit 1
  fi
  STALE=$(find "$REPO/src/main" -name '*.scala' -newer "$NEWEST_CLASS" | head -3)
  if [ -n "$STALE" ]; then
    echo "run_main.sh: sources newer than the compiled classes — run 'sbt compile' first:" >&2
    echo "$STALE" >&2
    exit 1
  fi
fi
exec java \
  --add-opens java.base/java.lang=ALL-UNNAMED \
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
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$REPO/target/scala-2.13/classes:$REPO/src/main/resources:/opt/spark/jars/*" \
  "$MAIN" "$@"
