#!/bin/bash
# Verifies the SparkSessionExtensions install path (no code-side register call):
#   sbt package && scripts/check_extensions.sh
set -e
cd "$(dirname "$0")/.."
JAR=target/scala-2.13/cdcstreamprocessorspark_2.13-0.1.0.jar
/opt/spark/bin/spark-submit \
  --master 'local[4]' \
  --conf spark.ui.enabled=false \
  --conf spark.sql.extensions=graft.functions.GraftExtensions \
  --class graft.ExtensionsCheck "$JAR" 2>/dev/null | grep EXTCHECK
