package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Repurposable ad-hoc decomposition harness (not part of the library
 * surface): current experiment = ×10 cost of the r15-reworked DSIR
 * (2-pass feature stream, was 5-pass) and dedup_semantic (window-min hub
 * edges). Committed r14 in-JVM ×10 baselines: data_dsir_weights 63.4,
 * data_dsir_sample 64.0, dedup_semantic 63.3 task-CPU-s. */
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

    val dir = "/tmp/probe_x10full"
    if (!new java.io.File(s"$dir/documents.parquet").exists()) {
      val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val repsArr = array((0 until 10).map(lit): _*)
      docs0.withColumn("_rep", explode(repsArr))
        .withColumn("doc_id", (col("doc_id").cast("long") * 10 + col("_rep")).cast("long"))
        .withColumn("text",
          when(col("_rep") === 0, col("text")).otherwise(
            array_join(transform(split(col("text"), " "),
              t => concat(t, lit("_"), col("_rep"))), " ")))
        .withColumn("source", col("source")) // keep source for isTarget
        .drop("_rep")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val emb0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      emb0.withColumn("_rep", explode(repsArr))
        .withColumn("vec_id", (col("vec_id").cast("long") * 10 + col("_rep")).cast("long"))
        .withColumn("embedding",
          when(col("_rep") === 0, col("embedding")).otherwise(
            zip_with(col("embedding"), sequence(lit(0), size(col("embedding")) - 1),
              (x, i) => x * (pmod(hash(col("_rep") * 1024 + i), lit(2)) * 2 - 1).cast("float"))))
        .drop("_rep")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    for (q <- Seq("dedup_simhash", "dedup_jaccard", "dedup_containment",
                  "dedup_substring", "dedup_streaming_parity", "dedup_minhash",
                  "dedup_cross")) {
      val fn = SparkEntry.queries(q)
      try { spark.catalog.clearCache(); noop(fn(spark, dir)) } catch { case e: Throwable =>
        System.err.println(s"warmup $q: ${e.getMessage}") }
      for (rep <- 1 to 2) {
        spark.catalog.clearCache(); System.gc()
        val (w, c) = timed { noop(fn(spark, dir)) }
        println(f"PROBE x10 rep$rep $q wall=$w%.2f taskCpu=$c%.2f")
      }
    }
    spark.stop()
  }
}
