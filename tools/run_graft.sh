#!/bin/bash
# Run a graft main OUTSIDE sbt — plain java against the compiled classes +
# the unmanaged Spark jars. Frees the single sbt lock so gates, benches and
# twin builds can pipeline; same --add-opens set as build.sbt's javaOptions.
#   tools/run_graft.sh graft.Verify /root/testdata/sf0.01 /tmp/out [names...]
#   SPARK_GRAFT_SF_DIR=... tools/run_graft.sh graft.Bench
# CAUTION (the mixed-compile hazard): a JVM loads classes LAZILY from
# target/scala-2.13/classes — never `sbt compile` while a run launched from
# here is still alive, or it silently mixes compile sessions.
MAIN=$1; shift
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx${SPARK_DRIVER_MEM:-8g} -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$MAIN" "$@"
