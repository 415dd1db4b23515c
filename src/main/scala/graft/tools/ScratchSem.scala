package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Similarity}

/** Throwaway A/B harness for the dedup_semantic rework (not part of the
 * library surface; driven manually during round-12 tuning). */
object ScratchSem {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val r = Similarity.adaptiveBits(n)
    println(s"n=$n adaptive r=$r")

    def time(name: String, reps: Int = 3)(body: => Unit): Unit = {
      (1 to reps).foreach { i =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        body
        println(f"$name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()

    def clustersOf(pairs: DataFrame): DataFrame =
      Dedup.clusters(emb.select(col("vec_id")), pairs, idCol = "vec_id")
        .withColumn("kept", col("vec_id") === col("cluster_id")).orderBy("vec_id")

    // warmup
    noop(clustersOf(Similarity.cosinePairs(emb, 0.30, 64, 6)))

    // chain-graph diagnostic: 256-node path, ids ascending — plain
    // min-label needs 255 rounds (hits maxIterations), pointer jumping ~10
    {
      import spark.implicits._
      val chainNodes = (0L until 256L).toDF("doc_id")
      val chainPairs = (0L until 255L).map(i => (i, i + 1, 1.0)).toDF("id_a", "id_b", "jaccard")
      val t0 = System.nanoTime()
      val cc = Dedup.clusters(chainNodes, chainPairs).agg(max(col("cluster_id"))).head()
      println(f"chain256 cc max-label=${cc.getLong(0)} took ${(System.nanoTime()-t0)/1e9}%.2f s")
    }

    val oldP = Similarity.cosinePairs(emb, 0.30, 64, 6).localCheckpoint(true)
    val bandP = Similarity.cosinePairsBanded(emb, 0.30, 64, 4, r).localCheckpoint(true)
    val spanP = Similarity.cosineSpanningPairs(emb, 0.30, 64, 4, r).localCheckpoint(true)
    time("cc_on_old_edges")(noop(clustersOf(oldP)))
    time("cc_on_banded_edges")(noop(clustersOf(bandP)))
    time("cc_on_spanning_edges")(noop(clustersOf(spanP)))
    time("spanning_full")(noop(clustersOf(Similarity.cosineSpanningPairs(emb, 0.30, 64, 4, r))))
    time("banded_full")(noop(clustersOf(Similarity.cosinePairsBanded(emb, 0.30, 64, 4, r))))
    time("old_full")(noop(clustersOf(Similarity.cosinePairs(emb, 0.30, 64, 6))))
    time("spanning_pairs_only")(noop(Similarity.cosineSpanningPairs(emb, 0.30, 64, 4, r)))
    time("banded_pairs_only")(noop(Similarity.cosinePairsBanded(emb, 0.30, 64, 4, r)))

    println("pair counts: old=" + Similarity.cosinePairs(emb, 0.30, 64, 6).count()
      + " banded=" + Similarity.cosinePairsBanded(emb, 0.30, 64, 4, r).count()
      + " spanning=" + Similarity.cosineSpanningPairs(emb, 0.30, 64, 4, r).count())
    spark.stop()
  }
}
