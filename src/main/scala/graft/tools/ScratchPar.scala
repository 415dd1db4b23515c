package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Throwaway stage profiler for dedup_clusters mining (round-12 tuning). */
object ScratchPar {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    (1 to 3).foreach { rep =>
      spark.catalog.clearCache(); System.gc(); Thread.sleep(200); System.gc()
      var t0 = System.nanoTime()
      def lap(name: String): Unit = {
        println(f"[par] rep$rep $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        t0 = System.nanoTime()
      }
      noop(Dedup.minhashSignatures(docs, 64))
      lap("signatures")
      val pairs = Dedup.minhashSpanningPairs(docs, 0.5)
      lap("spanningPairs (eager ckpt)")
      noop(Dedup.clusters(docs, pairs))
      lap("CC")
    }
    spark.stop()
  }
}
