package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway per-query timer (not part of the library surface; driven
 * manually during round-12 tuning). Args = query names from
 * SparkEntry.queries; times each with the bench's session config. */
object ScratchQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val names = if (args.nonEmpty) args.toSeq
      else Seq("dedup_clusters", "dedup_survivors", "dedup_semantic", "dedup_streaming_parity")
    names.foreach { name =>
      val q = graft.SparkEntry.queries(name)
      (1 to 3).foreach { i =>
        spark.catalog.clearCache(); System.gc(); Thread.sleep(250); System.gc()
        val t0 = System.nanoTime()
        q(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"[scratchq] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
