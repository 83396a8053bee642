#!/bin/bash
# Run graft.tools.AnchorScout directly on the compiled classes — NO sbt,
# so detached sweeps never recompile and never race a src/main edit
# (the round-12 incident). Usage: tools/scout.sh <args...>
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx12g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.AnchorScout "$@"
