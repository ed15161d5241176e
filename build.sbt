ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nasaasteroiddatalakehousespark"
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
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
// Benchmark-grade heap when the machine has it, bounded so the JVM can
// always start: min(24g, 2/3 of physical), floor 2g.
val defaultHeap: String = {
  val physMb =
    try {
      val bean = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      bean.getTotalMemorySize / (1024L * 1024L)
    } catch { case _: Throwable => 24L * 1024L }
  val mb = math.max(2048L, math.min(24L * 1024L, physMb * 2 / 3))
  s"${mb}m"
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
  // 8g was measurably too small once the suite passed ~115 queries ×
  // 3 reps in one JVM: heavy queries ran 2-3× their isolated medians
  // (GC churn from per-rep cache fills), and hundreds of generated
  // classes pressure the JIT code cache (full cache ⇒ silent
  // interpreter fallback). 24g/1g restores isolated-run timings.
  // The default is capped to ~2/3 of physical RAM so `sbt test` still
  // STARTS on smaller machines (a fixed 24g default refused to boot the
  // JVM there); set SPARK_DRIVER_MEM to override either way.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
  "-XX:ReservedCodeCacheSize=1g",
)
