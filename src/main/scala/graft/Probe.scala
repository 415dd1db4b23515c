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

    case class StageBill(name: String, cpuSec: Double, tasks: Int,
                         maxTaskSec: Double, medTaskSec: Double)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageBill]()
    // per-stage task durations (skew evidence: max/median per stage — the
    // §2.5 question "does a straggler own the stage?" needs per-task data
    // the aggregated stageInfo.taskMetrics cannot answer)
    val taskDur = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.ConcurrentLinkedQueue[Double]]()
    var record = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (record && te.taskInfo != null) {
          taskDur.computeIfAbsent(te.stageId,
            _ => new java.util.concurrent.ConcurrentLinkedQueue[Double]())
            .add(te.taskInfo.duration / 1e3)
        }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        if (record) {
          val si = sc.stageInfo
          val cpu = si.taskMetrics.executorCpuTime / 1e9
          import scala.jdk.CollectionConverters._
          val ds = Option(taskDur.get(si.stageId))
            .map(_.asScala.toVector.sorted).getOrElse(Vector.empty)
          val mx = if (ds.isEmpty) 0.0 else ds.last
          val md = if (ds.isEmpty) 0.0 else ds(ds.size / 2)
          // first graft frame in the submission stack names the operator
          val site = si.details.split('\n').find(_.startsWith("graft."))
            .getOrElse(si.name.take(40))
          stages.add(StageBill(
            s"stage${si.stageId} [$site]", cpu, si.numTasks, mx, md))
        }
      }
    })
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val dir = sys.env.getOrElse("PROBE_DIR", "/tmp/probe_x10full")

    // PROBE_BUILD=<mult> rebuilds the scaled tables into PROBE_DIR (the
    // exact Bench buildXN recipe — keys remapped per replica, documents
    // re-tokened, embeddings sign-flipped) and exits. The bench deletes
    // its own x10 dirs on completion, so ad-hoc A/Bs rebuild here.
    sys.env.get("PROBE_BUILD").foreach { multS =>
      val mult = multS.toInt
      val sfDir = sys.env.getOrElse("PROBE_SF_DIR", "/root/testdata/sf0.1")
      val repsArr = array((0 until mult).map(lit): _*)
      def scale(table: String, keyCols: Seq[String],
                extra: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = identity): Unit = {
        val df = spark.read.parquet(s"$sfDir/$table.parquet")
        val replicated = df.withColumn("_rep", explode(repsArr))
        val keyed = keyCols.foldLeft(replicated) { (d, k) =>
          d.withColumn(k,
            (col(k).cast("long") * mult + col("_rep")).cast(df.schema(k).dataType))
        }
        extra(keyed).drop("_rep")
          .repartition(spark.sparkContext.defaultParallelism)
          .write.mode("overwrite").parquet(s"$dir/$table.parquet")
      }
      scale("region", Seq("r_regionkey"))
      scale("nation", Seq("n_nationkey", "n_regionkey"))
      scale("customer", Seq("c_custkey", "c_nationkey"))
      scale("supplier", Seq("s_suppkey", "s_nationkey"))
      scale("part", Seq("p_partkey"))
      scale("orders", Seq("o_orderkey", "o_custkey"))
      scale("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
      scale("events", Seq("event_id", "user_id"))
      scale("documents", Seq("doc_id"), d => d.withColumn("text",
        when(col("_rep") === 0, col("text")).otherwise(
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit("_"), col("_rep"))), " "))))
      scale("embeddings", Seq("vec_id"), d => d.withColumn("embedding",
        when(col("_rep") === 0, col("embedding")).otherwise(
          zip_with(col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            (x, i) => x * (pmod(hash(col("_rep") * 1024 + i), lit(2)) * 2 - 1)
              .cast("float")))))
      println(s"BUILT x$mult at $dir")
      spark.stop()
      return
    }

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
      println(f"STAGE cpu=${s.cpuSec}%7.2f tasks=${s.tasks}%4d maxTask=${s.maxTaskSec}%6.2fs medTask=${s.medTaskSec}%6.2fs ${s.name}")
    }
    spark.stop()
  }
}
