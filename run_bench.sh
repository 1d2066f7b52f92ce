#!/bin/bash
# Direct-java bench launcher (no sbt JVM competing for cores).
# Mirrors build.sbt run/javaOptions: JDK17 add-opens + fixed pre-touched heap
# (this sandbox kernel's page faults cost ~9 CPU-s/GB sys time; pre-touching
# at JVM start keeps fault storms out of the timed passes).
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
MEM=${SPARK_DRIVER_MEM:-24g}
exec java -cp "$CP" $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx$MEM -Xms$MEM -XX:+AlwaysPreTouch "$@" graft.Bench
