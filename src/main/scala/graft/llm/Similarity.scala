package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`Array[Float]`).
 *
 * Baseline: brute-force cosine top-k — a single narrow scan + `zip_with`
 * dot product (codegen'd lambda functions, no UDF), top-k via
 * `orderBy.limit` which Spark executes as per-partition TakeOrdered + merge
 * (no full sort shuffle).
 *
 * Scale path: IVF-style coarse quantization — assign each vector to the
 * nearest of C centroids once (written as a partition key), probe only the
 * nearest `nprobe` cells at query time → scans 1/C-ish of 100 TB instead of
 * all of it. A random-hyperplane LSH bucketing variant is included for
 * pair-mining (cosine near-dup).
 */
object Similarity {

  /**
   * Declarative dot product (zip_with + aggregate). Correct but *interpreted*
   * per row — kept as the cross-check reference for the codegen'd expression;
   * hot paths use [[graft.functions.VectorOps]].
   */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def cosineHof(a: Column, b: Column): Column = {
    val denom = sqrt(dotHof(a, a)) * sqrt(dotHof(b, b))
    when(denom === 0.0, 0.0).otherwise(dotHof(a, b) / denom)
  }

  /** Fused single-pass cosine — native codegen'd Catalyst expression. */
  def cosine(a: Column, b: Column): Column = graft.functions.VectorOps.cosine(a, b)
  def dot(a: Column, b: Column): Column = graft.functions.VectorOps.dot(a, b)
  def norm(a: Column): Column = sqrt(graft.functions.VectorOps.dot(a, a))

  /** Cast float embedding to double once, up front (exact, deterministic math). */
  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /**
   * Brute-force cosine top-k against one query vector (broadcast as a literal
   * array — no join, no shuffle; TakeOrdered for the limit).
   */
  def topK(vectors: DataFrame, queryVec: Seq[Double], k: Int,
           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = array(queryVec.map(lit): _*)
    vectors
      .select(col(idCol), cosine(asDouble(col(vecCol)), q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /**
   * Batch top-k: nearest k corpus vectors for EACH query in `queries`
   * (broadcast the query side — the 100 TB corpus streams through once).
   */
  def topKBatch(vectors: DataFrame, queries: DataFrame, k: Int,
                idCol: String = "vec_id", vecCol: String = "embedding",
                qIdCol: String = "query_id", qVecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = vectors.crossJoin(
      broadcast(queries.select(col(qIdCol).as("_qid"), col(qVecCol).as("_qvec"))))
      .select(col("_qid"), col(idCol),
        cosine(asDouble(col(vecCol)), asDouble(col("_qvec"))).as("cos_sim"))
    val w = Window.partitionBy("_qid").orderBy(col("cos_sim").desc, col(idCol))
    joined.withColumn("_rk", row_number().over(w)).filter(col("_rk") <= k)
      .select(col("_qid").as(qIdCol), col(idCol), col("cos_sim"))
  }

  /**
   * Exact all-pairs cosine ≥ threshold (the correctness baseline the LSH
   * variant is verified against). O(n²) — only for modest n or within IVF
   * cells; at 100 TB use [[cosinePairs]] (LSH) or [[ivfAssign]] partitioning.
   */
  def cosinePairsExact(vectors: DataFrame, threshold: Double,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    // Broadcast the (id, vec, Σv²) block once; each task owns a slice of rows
    // and scans the block with a fused primitive loop. Same op order as the
    // CosineSimilarity expression → bit-identical results. The broadcast is
    // the deliberate trade: exact all-pairs is only for modest n / IVF cells.
    val block: Array[(Long, Array[Double], Double)] = vectors
      .select(col(idCol).cast("long").as("_1"), asDouble(col(vecCol)).as("_2"))
      .as[(Long, Array[Double])]
      .collect()
      .map { case (id, v) =>
        var na = 0.0; var i = 0
        while (i < v.length) { na += v(i) * v(i); i += 1 }
        (id, v, na)
      }
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(block)
    val n = block.length
    val par = spark.sparkContext.defaultParallelism
    val pairs = spark.range(0, n, 1, math.min(par * 4, math.max(n, 1)))
      .as[Long]
      .flatMap { ai =>
        val blk = bc.value
        val (ida, va, na) = blk(ai.toInt)
        val out = Seq.newBuilder[(Long, Long, Double)]
        var bi = ai.toInt + 1
        while (bi < blk.length) {
          val (idb, vb, nb) = blk(bi)
          var dot = 0.0; var i = 0
          while (i < va.length) { dot += va(i) * vb(i); i += 1 }
          val denom = math.sqrt(na) * math.sqrt(nb)
          val cos = if (denom == 0.0) 0.0 else dot / denom
          if (cos >= threshold) out += ((ida, idb, cos))
          bi += 1
        }
        out.result()
      }
    pairs.toDF("id_a", "id_b", "cos_sim")
      .select(col("id_a"), col("id_b"), round(col("cos_sim"), 6).as("cos_sim"))
  }

  /**
   * Random-hyperplane LSH signature: `bits` sign bits of projections onto
   * deterministic pseudo-random hyperplanes. Vectors with high cosine
   * similarity collide with high probability.
   */
  def lshSignature(vec: Column, dim: Int, bits: Int): Column = {
    // deterministic "hyperplanes": h[b][i] in {-1,+1} from a fixed mix of (b,i)
    def sign(b: Int, i: Int): Double = {
      var z = b.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L + 0x1234567L
      z = (z ^ (z >>> 30)) * 0x94D049BB133111EBL
      if (((z ^ (z >>> 27)) & 1L) == 0L) 1.0 else -1.0
    }
    val v = asDouble(vec)
    (0 until bits).map { b =>
      val proj = (0 until dim).map(i => element_at(v, i + 1) * lit(sign(b, i))).reduce(_ + _)
      shiftleft(when(proj > 0, 1L).otherwise(0L), b)
    }.reduce((x, y) => x.bitwiseOR(y))
  }

  /**
   * Embedding-cosine near-dup pairs ≥ threshold, LSH-bucketed: candidates from
   * shared signature (optionally multiple band tables), verified exactly.
   * At sf-test sizes this degenerates gracefully; at 100 TB the bucket join
   * replaces the O(n²) cross join.
   */
  def cosinePairs(vectors: DataFrame, threshold: Double, dim: Int, bits: Int = 8,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sig = vectors.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshSignature(col(vecCol), dim, bits).as("sig"))
    val a = sig.select(col("sig"), col("id").as("id_a"), col("v").as("v_a"))
    val b = sig.select(col("sig"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, "sig").filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(asDouble(col("v_a")), asDouble(col("v_b"))).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  /**
   * IVF coarse index: centroid assignment against a broadcast centroid table.
   * `centroids`: (centroid_id, vec). Returns vectors tagged with their nearest
   * centroid — at scale, write partitionBy("centroid_id") and probe cells.
   */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame,
                idCol: String = "vec_id", vecCol: String = "embedding",
                cIdCol: String = "centroid_id", cVecCol: String = "vec"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = vectors.crossJoin(broadcast(
      centroids.select(col(cIdCol).as("_cid"), col(cVecCol).as("_cvec"))))
      .select(col(idCol), col(vecCol), col("_cid"),
        cosine(asDouble(col(vecCol)), asDouble(col("_cvec"))).as("_sim"))
    val w = Window.partitionBy(idCol).orderBy(col("_sim").desc, col("_cid"))
    joined.withColumn("_rk", row_number().over(w)).filter(col("_rk") === 1)
      .select(col(idCol), col(vecCol), col("_cid").as(cIdCol))
  }
}
