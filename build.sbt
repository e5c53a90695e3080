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
  // 69 queries x (warmup + measured) of whole-stage-codegen classes
  // overflow the default 240m code cache -> JIT stops compiling and the
  // JSON-heavy queries run interpreted. 512m (r6) stopped sufficing when
  // the suite grew past ~65 queries: the late-alphabet queries and the
  // stream phase (which runs LAST) measured 3-8x their isolated warm
  // cost while early queries stayed normal — the code-cache-full
  // signature again.
  "-XX:ReservedCodeCacheSize=1g",
  // gc log: cheap, overwritten per fork — the bench reads it to rule
  // GC in or out when a query's wall time spikes run-to-run
  "-Xlog:gc:file=/tmp/graft_gc.log",
)
