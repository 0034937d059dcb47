ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdataprocessingspark"
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
// Forked-run stdout passes through RAW (no "[info] " log decoration):
// the bench/verify consumers parse JSON lines out of the stdout tail,
// and a log prefix would break any parser that expects the line to
// start with '{'.
run / outputStrategy := Some(StdoutOutput)
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
  // bucketed-table writes (saveAsTable) land here, not in the repo cwd
  "-Dspark.sql.warehouse.dir=/tmp/graft_warehouse",
  "-Dderby.system.home=/tmp/graft_derby",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Pin the heap (Xms=Xmx) and fault every page in AT STARTUP: the
  // r16 A/B (PERF_COMPARE.md) measured this host's fresh-page fault
  // path degrading by >50x mid-session (8 GB touch: ~3 s healthy,
  // >180 s degraded) — a growing heap then pays that inside TIMED
  // queries (uniform wall inflation, identical jobs/shuffle, GC/sys
  // time through the roof: exactly rounds 14-15's "contention"
  // mystery). Pre-touch moves the entire cost into JVM startup,
  // which Bench's warmup query absorbs, so per-query timings stay
  // comparable across host states.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
)
