package graft

import org.apache.spark.sql.SparkSession

/**
 * Fresh-JVM single-query probe, spawned by Bench for ×10-scale queries
 * whose in-JVM task-CPU exceeds the fresh-probe threshold.
 *
 * Rationale (r8 verdict #4): cdc_binlog_decode ×10 recorded 489.6
 * task-CPU-s at the tail of the 2371 s bench JVM vs 165 steady-state in a
 * fresh JVM A/B — per-scale untimed warmups and min-of-reps did NOT close
 * the gap, so the excess is long-JVM phase (JIT profile pollution from ~50
 * other query shapes, heap occupancy) rather than first-touch cost, and no
 * in-JVM protocol can remove it. A child JVM measures the PLAN. Both
 * numbers land in the artifact: the fresh value in the binding maps, the
 * in-JVM value under fresh_jvm_remeasured.
 *
 * Args: <queryName> <x1Dir> <x10Dir> <reps> <outFile> [cpus]
 * `x10Dir == "-"` measures x1Dir ONLY (the r14 requiet escape: one
 * fresh-JVM wall for a suite query whose in-JVM requiet re-run still reads
 * sick); output then ends `|-|-`.
 * Output: one line to outFile — name|x1_wall|x1_taskcpu|x10_wall|x10_taskcpu
 */
object ProbeOne {
  private class TaskCpu extends org.apache.spark.scheduler.SparkListener {
    private val ns = new java.util.concurrent.atomic.AtomicLong(0)
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) ns.addAndGet(m.executorCpuTime)
    }
    def drainSec(): Double = ns.getAndSet(0L) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val Array(name, x1Dir, x10Dir, repsS, outFile) = args.take(5)
    val reps = repsS.toInt
    val cpus = if (args.length > 5) args(5) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val taskCpu = new TaskCpu
    spark.sparkContext.addSparkListener(taskCpu)
    val fn = SparkEntry.queries(name)

    // Same per-rep protocol as Bench's in-JVM probe: untimed warmup, then
    // min-wall of `reps` timed reps with clearCache+gc before each.
    def measure(dir: String): (Double, Double) = {
      try {
        spark.catalog.clearCache()
        fn(spark, dir).write.mode("overwrite").format("noop").save() // warmup
      } catch { case e: Throwable =>
        System.err.println(s"[probeone] warmup $name@$dir failed: ${e.getMessage}")
      }
      val runs = (1 to reps).flatMap { _ =>
        try {
          spark.catalog.clearCache()
          System.gc()
          Thread.sleep(250)
          System.gc()
          taskCpu.drainSec()
          val t0 = System.nanoTime()
          fn(spark, dir).write.mode("overwrite").format("noop").save()
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(80) // let trailing TaskEnd events land
          Some((wall, taskCpu.drainSec()))
        } catch { case e: Throwable =>
          System.err.println(s"[probeone] $name@$dir failed: ${e.getMessage}")
          None
        }
      }
      runs.minByOption(_._1).getOrElse((Double.NaN, Double.NaN))
    }

    val (w1, tc1) = measure(x1Dir)
    val tail =
      if (x10Dir == "-") "-|-"
      else { val (w10, tc10) = measure(x10Dir); s"$w10|$tc10" }
    spark.stop()
    val pw = new java.io.PrintWriter(outFile)
    try pw.println(s"$name|$w1|$tc1|$tail") finally pw.close()
  }
}
