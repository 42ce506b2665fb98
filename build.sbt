ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "entitydisambiguationspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// forked run output straight to stdout (no "[info] " prefix) so the driver
// can parse Bench's single JSON line verbatim
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
// no "[success] Total time: …" trailer after runMain: the driver captures a
// fixed-size stdout TAIL and parses the last line as JSON — the trailer both
// ate tail budget and displaced Bench's JSON line from last position
Global / showSuccess := false
Global / excludeLintKeys ++= Set(showSuccess, run / outputStrategy)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  "-Dfile.encoding=UTF-8",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// The sandbox has no locale (LANG empty => JVM sun.jnu.encoding =
// ANSI_X3.4-1968, which cannot open non-ASCII file paths — e.g. the zh
// triples sink's pred=attr:… partition dirs). sun.jnu.encoding is NOT
// overridable with -D on JDK 17; only the process locale works. Real
// clusters run UTF-8 locales; pin the same for forked test/run JVMs.
Test / envVars += ("LC_ALL" -> "C.utf8")
Compile / run / envVars += ("LC_ALL" -> "C.utf8")
