#!/usr/bin/env bash
# C.utf8: the sandbox ships no default locale (LANG empty -> JVM
# sun.jnu.encoding=ANSI_X3.4-1968, which cannot open non-ASCII file
# paths, e.g. the zh triples sink's pred=attr:... partition dirs).
# -Dsun.jnu.encoding is ignored on JDK17 - only the locale works.
export LC_ALL=C.utf8
java --add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED  -Dfile.encoding=UTF-8 -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp 'target/scala-2.13/classes:/opt/spark/jars/*' "$@"
