#!/bin/bash
# Incrementally compile given main-source files straight into
# target/scala-2.13/classes with the Spark-shipped scalac — sbt-free
# iteration while a long sbt task holds the build lock.
# Usage: scripts/jcompile.sh src/main/scala/graft/Foo.scala [...]
set -e
exec java -cp "/opt/spark/jars/*" scala.tools.nsc.Main \
  -classpath "/opt/spark/jars/*:/root/repo/target/scala-2.13/classes" \
  -d /root/repo/target/scala-2.13/classes "$@"
