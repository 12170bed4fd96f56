#!/bin/bash
# spark-submit launcher (the production entry path — swap --master for the
# cluster manager): scripts/spark-submit.sh <MainClass> [args...]
# Env: SPARK_MASTER (default local[SPARK_GRAFT_CPUS]), SPARK_DRIVER_MEM.
set -e
MAIN=$1; shift
JAR=$(ls -t /root/repo/target/scala-2.13/fuzzymatchspark_*.jar 2>/dev/null | head -1)
if [ -z "$JAR" ]; then echo "no jar — run: sbt -batch package" >&2; exit 1; fi
exec /opt/spark/bin/spark-submit \
  --class "$MAIN" \
  --master "${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-8}]}" \
  --driver-memory "${SPARK_DRIVER_MEM:-8g}" \
  --conf spark.ui.enabled=false \
  --conf spark.sql.session.timeZone=UTC \
  "$JAR" "$@"
