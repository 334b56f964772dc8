ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sociallinkpredictionspark"
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
// Forked output goes straight to stdout, NOT through sbt's logger — the
// driver parses Bench's one-line JSON from stdout, and the logger's
// "[info] " prefix breaks that parse (BENCH_r01.json: parsed=null).
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
  // Measured at the sf1 checkpoint: 8g beats 48g by ~35% on the full
  // 217-query sweep. The big heap lets MEMORY_AND_DISK caches and BSP
  // localCheckpoint blocks accumulate un-collected (the ContextCleaner
  // is GC-driven), so the graph loops hit multi-second old-gen pauses
  // (graph_pagerank 11.6 → 35.0 s); the small heap keeps GC frequent,
  // the cleaner live, and overflow on disk where re-reads are cheap.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // SPARK_GRAFT_GC_LOG=<file>: unified GC logging for the forked JVM.
  // Diagnostic for multi-minute whole-JVM stalls at scale checkpoints —
  // a stall that shows in the log is GC; one that doesn't is the
  // hypervisor (CPU steal), which no heap tuning will fix.
  sys.env.get("SPARK_GRAFT_GC_LOG")
    .map(f => s"-Xlog:gc*:file=$f:time,uptime").toSeq
