package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.llm.Dedup

/** Throwaway stage profiler for dedup_streaming_parity (round-12 tuning). */
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
      val cands = graft.streaming.StreamingDedup
        .replayedCandidates(docs, threshold = 0.5).toDF()
        .select(least(col("docId"), col("dupOf")).as("id_a"),
          greatest(col("docId"), col("dupOf")).as("id_b"), col("estJaccard"))
        .groupBy("id_a", "id_b").agg(max("estJaccard").as("est"))
        .localCheckpoint(true)
      lap("fold+ckpt")
      val sure = cands.filter(col("est") >= 0.9).select("id_a", "id_b")
      val border = cands.filter(col("est") < 0.9).select("id_a", "id_b")
      val nBorder = border.count()
      lap(s"count(n=$nBorder)")
      val borderIds = border.select(col("id_a").as("id"))
        .unionByName(border.select(col("id_b").as("id"))).distinct()
      val bFeats = docs
        .join(broadcast(borderIds), docs("doc_id") === borderIds("id"), "left_semi")
        .select(col("doc_id"),
          graft.functions.TextHashOps.xxhash64Array(
            Dedup.shingleSet(col("text"))).as("feats"))
        .localCheckpoint(true)
      lap("bFeats ckpt")
      val fa = bFeats.select(col("doc_id").as("id_a"), col("feats").as("fa"))
      val fb = bFeats.select(col("doc_id").as("id_b"), col("feats").as("fb"))
      val verified = border.join(broadcast(fa), "id_a").join(broadcast(fb), "id_b")
        .filter(size(array_intersect(col("fa"), col("fb"))).cast(DoubleType) /
          size(array_union(col("fa"), col("fb"))).cast(DoubleType) >= 0.5)
        .select("id_a", "id_b")
      noop(verified)
      lap("verify (forced)")
      noop(Dedup.clusters(docs, sure.unionByName(verified)).orderBy("doc_id"))
      lap("CC+orderBy")
    }
    spark.stop()
  }
}
