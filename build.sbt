ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flinkcdcspark"
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
// Emit forked-run stdout raw (no sbt "[info] " prefix) so the driver can
// parse Bench's single JSON output line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // the container env has no LANG set, so the JVM defaults to US-ASCII —
  // which silently garbles non-ASCII text in any path that touches the
  // platform charset (e.g. VariantVal JSON rendering)
  "-Dfile.encoding=UTF-8",
  // local[32] at sf0.1 runs 32 concurrent tasks in ONE JVM: 8g forced
  // near-constant GC once the suite passed ~60 queries (r6 bench: broad
  // ~1.4x slowdowns + one 59s outlier, all gone at 28g). The host has
  // 128 GiB; Xmx is reservation-only.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "28g")}",
  // Whole-stage-codegen classes from (warmup + 2 measured passes) of the
  // full suite overflow the JIT code cache and everything after runs
  // interpreted: 240m default died at ~40 queries, 512m (r6) at ~65
  // (late-alphabet queries + the last-run stream phase at 3-8x isolated
  // warm cost while early queries stay normal — the signature), and 1g
  // (r7) at 79 queries (r12 artifact: q77 7.45s / q79 28.46s vs
  // 0.86/2.6s isolated). Bench now logs CodeHeap occupancy per phase to
  // stderr so the next ceiling is visible before it bites.
  "-XX:ReservedCodeCacheSize=2g",
  // gc log: cheap, overwritten per fork — the bench reads it to rule
  // GC in or out when a query's wall time spikes run-to-run
  "-Xlog:gc:file=/tmp/graft_gc.log",
)
