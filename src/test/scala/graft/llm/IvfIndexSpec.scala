package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class IvfIndexSpec extends SparkSpec {

  private def corpus(n: Int, dim: Int) = {
    import spark.implicits._
    // deterministic vectors on a few directions so cells are meaningful
    (0 until n).map { i =>
      val v = Array.tabulate(dim)(d =>
        (math.sin(i * 0.7 + d) + (if (d % 8 == i % 8) 2.0 else 0.0)).toFloat)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("persisted index answers identically to the in-memory frames; cells partition-prune") {
    val dim = 16
    val emb = corpus(300, dim)
    val cents = Similarity.trainCentroids(emb, k = 8, iters = 3)
    val dir = Files.createTempDirectory("ivf_index").toString
    Similarity.writeIvfIndex(emb, cents, dir)

    val qv = (0 until dim).map(d => math.cos(d * 0.3))
    val fromIndex = Similarity.ivfTopKIndexed(spark, dir, qv, k = 10, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inMemory = Similarity.ivfTopK(
        Similarity.ivfAssign(emb, cents), cents, qv, k = 10, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromIndex == inMemory, "round-trip through parquet must not change results")

    // the on-disk layout: one directory per cell, hive-style
    val cellDirs = new java.io.File(s"$dir/cells").listFiles()
      .filter(_.getName.startsWith("centroid_id=")).map(_.getName).sorted
    assert(cellDirs.length > 1, s"expected multiple cell partitions, got ${cellDirs.toSeq}")

    // probing is partition pruning: a cell-id predicate reaches the scan as
    // a PartitionFilter (no data files outside the probed cells are read)
    val (cells, _) = Similarity.readIvfIndex(spark, dir)
    val pruned = cells.filter(col("centroid_id").isin(0L, 1L))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("centroid_id"),
      s"cell predicate must prune partitions, plan:\n$scan")
    // and the pruned scan reads strictly fewer rows than the full index
    assert(pruned.count() < cells.count())
  }

  test("index survives re-open in a fresh read and respects nprobe recall ordering") {
    val dim = 12
    val emb = corpus(200, dim)
    val cents = Similarity.trainCentroids(emb, k = 6, iters = 2)
    val dir = Files.createTempDirectory("ivf_index2").toString
    Similarity.writeIvfIndex(emb, cents, dir)
    val qv = (0 until dim).map(d => math.sin(d * 0.5))
    // more probes can only improve (or keep) the best similarity found
    def best(nprobe: Int): Double =
      Similarity.ivfTopKIndexed(spark, dir, qv, k = 1, nprobe = nprobe)
        .collect().headOption.map(_.getDouble(1)).getOrElse(-2.0)
    val b1 = best(1); val b3 = best(3); val b6 = best(6)
    assert(b1 <= b3 + 1e-12 && b3 <= b6 + 1e-12, s"recall must be monotone in nprobe: $b1 $b3 $b6")
    // nprobe = all cells ≡ exact brute force over the corpus
    val exact = emb.select(col("vec_id"),
        Similarity.cosine(col("embedding"), array(qv.map(lit): _*)).as("cs"))
      .orderBy(col("cs").desc, col("vec_id")).limit(1)
      .collect().head.getDouble(1)
    assert(math.abs(b6 - exact) < 1e-9)
  }
}
