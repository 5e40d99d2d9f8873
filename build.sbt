ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "spark_clusteringspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites share one SparkSession and some assert on GLOBAL session state
// (cacheManager emptiness); concurrent suites would race those asserts.
Test / parallelExecution := false
run / fork := true
// The round driver parses the LAST stdout line of `sbt runMain graft.Bench`
// as JSON. Two sbt default behaviors broke that for three straight rounds
// (BENCH_r9..r11 "parsed": null): the forked process's stdout is re-logged
// with an "[info] " prefix, and sbt appends a "[success] Total time: ..."
// epilogue AFTER the program's output. Route forked stdout through raw
// (no prefix) and suppress the epilogue so the program's own final line
// is the process's final line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / showTiming := false
// the two keys above are consumed by sbt's command engine, which the
// unused-setting lint can't see
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
// quarter of physical RAM, clamped to [4g, 28g]; 8g if unreadable
val defaultHeap: String = {
  val gb =
    try {
      val kb = scala.io.Source.fromFile("/proc/meminfo").getLines()
        .collectFirst { case l if l.startsWith("MemTotal:") =>
          l.trim.split("\\s+")(1).toLong }
      kb.map(k => math.max(4L, math.min(28L, k / (1024L * 1024L * 4L)))).getOrElse(8L)
    } catch { case _: Exception => 8L }
  s"${gb}g"
}

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
  // 8g forced GC thrash + cache spill at sf0.1 with 32 executor
  // threads (bench totals swung 112s..166s run to run). Default to a
  // quarter of physical RAM capped at 28g (the 128 GiB bench box gets
  // the full 28g; a 16 GiB laptop gets 4g and still starts) —
  // SPARK_DRIVER_MEM overrides either way.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
)
