package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Repurposable ad-hoc decomposition harness (not part of the library
 * surface): current experiment = per-STAGE task-CPU attribution of the
 * dedup CC family at ×10 (the per-section timers mis-attribute across
 * stage boundaries when trailing TaskEnd events land after the sleep;
 * onStageCompleted bills exactly). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    case class StageBill(name: String, cpuSec: Double, tasks: Int)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageBill]()
    var record = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        if (record) {
          val si = sc.stageInfo
          val cpu = si.taskMetrics.executorCpuTime / 1e9
          stages.add(StageBill(
            s"stage${si.stageId} ${si.name.take(60)} [${si.details.split('\n').take(3).mkString(" <- ").take(160)}]",
            cpu, si.numTasks))
        }
      }
    })
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val dir = sys.env.getOrElse("PROBE_DIR", "/tmp/probe_x10full")
    val q = sys.env.getOrElse("PROBE_QUERY", "dedup_survivors")
    val fn = SparkEntry.queries(q)
    // untimed warmup
    spark.catalog.clearCache(); noop(fn(spark, dir))
    spark.catalog.clearCache(); System.gc(); Thread.sleep(300)
    record = true
    val t0 = System.nanoTime()
    noop(fn(spark, dir))
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(400)
    record = false
    import scala.jdk.CollectionConverters._
    val all = stages.asScala.toSeq
    println(f"TOTAL $q wall=$wall%.2f stages=${all.size} taskCpu=${all.map(_.cpuSec).sum}%.2f")
    all.sortBy(-_.cpuSec).take(25).foreach { s =>
      println(f"STAGE cpu=${s.cpuSec}%7.2f tasks=${s.tasks}%4d ${s.name}")
    }
    spark.stop()
  }
}
