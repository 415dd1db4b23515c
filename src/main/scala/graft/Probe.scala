package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Repurposable ad-hoc decomposition harness (not part of the library
 * surface): current experiment = dedup_clusters / dedup_survivors ×1/×10
 * A/B after the r15 mining rework (Mersenne-folded minhash, fused band
 * hashes, window-min hub edges). Baseline (same protocol, pre-rework):
 * ×10 full_survivors 177.6/194.9, full_clusters 190.2/196.4, pairs_only
 * 152.3, sig_only 26.2; ×1 full_clusters 20.3/23.0, sig_only 14.2. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskNs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) taskNs.addAndGet(m.executorCpuTime): Unit
      }
    })
    def timed(f: => Unit): (Double, Double) = {
      Thread.sleep(100); taskNs.set(0)
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(150)
      (wall, taskNs.get / 1e9)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    import graft.llm.Dedup
    val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def build(mult: Int): String = {
      val dir = s"/tmp/probe_dedup_x$mult"
      if (!new java.io.File(dir).exists()) {
        val repsArr = array((0 until mult).map(lit): _*)
        docs0.withColumn("_rep", explode(repsArr))
          .withColumn("doc_id",
            (col("doc_id").cast("long") * mult + col("_rep")).cast("long"))
          .withColumn("text",
            when(col("_rep") === 0, col("text")).otherwise(
              array_join(transform(split(col("text"), " "),
                t => concat(t, lit("_"), col("_rep"))), " ")))
          .drop("_rep")
          .repartition(spark.sparkContext.defaultParallelism)
          .write.mode("overwrite").parquet(dir)
      }
      dir
    }

    for (m <- Seq(1, 10); dir = build(m)) {
      val docs = spark.read.parquet(dir)
      val n = docs.count()
      for (rep <- 1 to 2) {
        spark.catalog.clearCache(); System.gc()
        val (w, c) = timed {
          noop(Dedup.clusterSurvivors(docs, Dedup.minhashSpanningPairs(docs, 0.5))
            .select(col("doc_id")))
        }
        println(f"PROBE x$m rep$rep n=$n full_survivors wall=$w%.2f taskCpu=$c%.2f")
      }
      for (rep <- 1 to 2) {
        spark.catalog.clearCache(); System.gc()
        val (w, c) = timed {
          noop(Dedup.clusters(docs, Dedup.minhashSpanningPairs(docs, 0.5)))
        }
        println(f"PROBE x$m rep$rep full_clusters wall=$w%.2f taskCpu=$c%.2f")
      }
      spark.catalog.clearCache(); System.gc()
      val (wp, cp) = timed { noop(Dedup.minhashSpanningPairs(docs, 0.5)) }
      println(f"PROBE x$m pairs_only wall=$wp%.2f taskCpu=$cp%.2f")
      spark.catalog.clearCache(); System.gc()
      val (ws, cs) = timed { noop(Dedup.minhashSignatures(docs, 64)) }
      println(f"PROBE x$m sig_only wall=$ws%.2f taskCpu=$cs%.2f")
      // sanity: edge count must match the pre-rework graph (2462 at x10)
      val ne = Dedup.minhashSpanningPairs(docs, 0.5).count()
      println(s"PROBE x$m edges=$ne")
    }
    spark.stop()
  }
}
