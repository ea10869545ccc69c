#!/bin/bash
# Direct-JVM bench runner (skips sbt startup). Usage:
#   scripts/bench.sh [sfdir] [only-csv] [reps]
SF=${1:-/root/testdata/sf0.1}
ONLY=${2:-}
REPS=${3:-3}
SCALA_JAR=$(find /root/.cache/coursier -name "scala-library-2.13*.jar" | head -1)
REFLECT_JAR=$(find /root/.cache/coursier -name "scala-reflect-2.13*.jar" | head -1)
CP="/root/repo/target/scala-2.13/classes:$SCALA_JAR:$REFLECT_JAR:/opt/spark/jars/*"
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_ONLY="$ONLY" SPARK_GRAFT_REPS="$REPS" \
  java -Xmx96g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -cp "$CP" graft.Bench 2>/dev/null | grep '"metric"'
