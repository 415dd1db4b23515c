ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "deltaforgespark"
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
// Forked run output passes through verbatim (no sbt "[info] " prefix) so
// the driver can parse Bench's single JSON line from stdout.
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
// Heap request clamped against the machine: the round-9 binding bench was
// OOM-killed (exit 137) because the environment set SPARK_DRIVER_MEM near
// the machine's full RAM and -Xms + AlwaysPreTouch commits the entire heap
// at JVM start — 94.6 GiB parent + a probe child left nothing for the OS.
// Cap at MemTotal/2 so the pre-touched heap can NEVER crowd out the bench's
// fresh-JVM probe children (which run with their own bounded ~16g heap) or
// the kernel, regardless of what the environment requests.
val heapClampedMb: Long = {
  def mb(s: String): Long = {
    val t = s.trim.toLowerCase
    if (t.endsWith("g")) t.dropRight(1).toLong * 1024L
    else if (t.endsWith("m")) t.dropRight(1).toLong
    else if (t.endsWith("k")) t.dropRight(1).toLong / 1024L
    else t.toLong / (1024L * 1024L) // bare number = bytes
  }
  val requested = mb(sys.env.getOrElse("SPARK_DRIVER_MEM", "24g"))
  val memTotal = try {
    scala.io.Source.fromFile("/proc/meminfo").getLines()
      .find(_.startsWith("MemTotal")).map(_.split("\\s+")(1).toLong / 1024L)
      .getOrElse(128L * 1024L)
  } catch { case _: Throwable => 128L * 1024L }
  math.max(4096L, math.min(requested, memTotal / 2))
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] with a 39-query bench needs headroom: 8g thrashes GC once
  // cached intermediates + broadcast cleanup pile up (machine has 128g)
  s"-Xmx${heapClampedMb}m",
  // Pre-commit and pre-touch the whole heap at JVM start: the bench's ×10
  // probe measured the FIRST large-allocation execution of a plan shape at
  // 20× its steady-state task-CPU (3306 vs 165 s for the same query on the
  // same data in the same JVM) — first-touch page faults on freshly
  // committed heap pages are charged to the faulting task threads, so lazy
  // heap growth lands inside whichever timed window triggers it.
  s"-Xms${heapClampedMb}m",
  "-XX:+AlwaysPreTouch",
  // ~50 queries × (x1 suite + x1-adjacent + x10 probe) × several codegen
  // stages each ≫ the 240m default; an exhausted code cache silently stops
  // JIT compilation and the tail of the run measures interpreted bytecode
  "-XX:ReservedCodeCacheSize=512m",
)
