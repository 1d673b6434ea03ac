#!/bin/bash
# Bare-java soak launcher: full Spark JDK-17 add-opens (build.sbt set),
# frees the sbt lock for concurrent non-measured work. Usage:
#   run_soak.sh <MainClass> <heap> <logfile> [args...]
MAIN=$1; HEAP=$2; LOG=$3; shift 3
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
exec java $ADD_OPENS -Xmx$HEAP -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp "$CP" "$MAIN" "$@" > "$LOG" 2>&1
