package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc perf probe (not part of the driver contract). */
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
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def timed(f: => Unit): (Double, Double) = {
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      f
      ((System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9)
    }

    // dedup_clusters ×10 growth attribution: edges, rounds, CC-only CPU
    import graft.llm.Dedup
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    def scaled(mult: Int) =
      if (mult == 1) docs
      else docs
        .withColumn("_rep", explode(array((0 until mult).map(lit): _*)))
        .withColumn("doc_id", col("doc_id") * mult + col("_rep"))
        .withColumn("text", when(col("_rep") === 0, col("text")).otherwise(
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit("_"), col("_rep"))), " ")))
        .drop("_rep")

    for (m <- Seq(1, 10)) {
      val d = scaled(m)
      val nDocs = d.count()
      // materialize pairs OUTSIDE the timed CC section
      val pairs = Dedup.jaccardPairs(d, 0.5, maxDf = Some(1000L)).localCheckpoint(true)
      val nPairs = pairs.count()
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .distinct().localCheckpoint(true)
      val nEdges = edges.count()
      val (wall, cpu) = timed {
        var labels = d.select(col("doc_id").as("id")).withColumn("label", col("id"))
          .localCheckpoint(true)
        var converged = false
        var iter = 0
        while (!converged && iter < 50) {
          val neighborMin = edges
            .join(labels.select(col("id").as("dst"), col("label")), "dst")
            .groupBy(col("src").as("id")).agg(min(col("label")).as("_nmin"))
          val next = labels.join(neighborMin, Seq("id"), "left")
            .select(col("id"),
              least(col("label"), coalesce(col("_nmin"), col("label"))).as("label"),
              coalesce(col("_nmin") < col("label"), lit(false)).as("_changed"))
            .localCheckpoint(true)
          val probe = next.agg(max(col("_changed")), sum(col("_changed").cast("long"))).head()
          converged = probe.isNullAt(0) || !probe.getBoolean(0)
          println(s"PROBE x$m round=$iter changed=${if (probe.isNullAt(1)) 0 else probe.getLong(1)}")
          labels = next.select("id", "label")
          iter += 1
        }
        println(s"PROBE x$m rounds=$iter")
      }
      println(f"PROBE x$m docs=$nDocs pairs=$nPairs edges=$nEdges ccWall=$wall%.2f ccCpu=$cpu%.2f")
    }
    spark.stop()
  }
}
