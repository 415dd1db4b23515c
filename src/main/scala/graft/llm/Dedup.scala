package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines, in increasing fuzziness:
 * exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.
 *
 * Scale design (100 TB): every path is groupBy/join on a derived key — no
 * driver-side state, no O(n²) comparisons. Candidate generation (LSH bands /
 * SimHash chunks / shared tokens) bounds the pair space before any exact
 * verification join; all joins are hash-partitioned on high-cardinality keys
 * (hashes), so skew is bounded and AQE can split hot buckets.
 */
object Dedup {

  /** Exact dedup: hash-groupBy on content, keep lowest id as canonical. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** Rows surviving exact dedup (canonical representatives only). */
  def exactSurvivors(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val canon = exact(docs, idCol, textCol).select(col("canonical_id").as(idCol))
    docs.join(canon, idCol) // broadcast-able when survivors are small; else shuffle-hash on id
  }

  /** (id, token) distinct pairs — the posting list both Jaccard and MinHash build on. */
  private def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), explode(TextAnalysis.tokenSet(col(textCol))).as("tok"))

  /** Word n-gram shingles (n consecutive tokens joined by space), distinct per doc. */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(filter(
      transform(toks, (_, i) => concat_ws(" ", slice(toks, i + 1, lit(n)))),
      s => size(split(s, " ")) === n))
  }

  /**
   * N-gram (token-set) Jaccard near-dup pairs ≥ threshold.
   * Inverted-index self-join on shared tokens → pair co-occurrence counts →
   * exact Jaccard. The join key (token) is the candidate generator; document
   * frequency cap `maxDf` drops ubiquitous tokens so the self-join can't
   * quadratically explode on stopwords — the standard scale guard.
   */
  def jaccardPairs(
      docs: DataFrame,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxDf: Long = 1000000L): DataFrame = {
    val posts = postings(docs, idCol, textCol)
    val filtered = {
      val df = posts.groupBy("tok").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select("tok")
      posts.join(df, "tok")
    }
    val sizes = filtered.groupBy("id").agg(count(lit(1)).as("set_size"))
    val a = filtered.select(col("id").as("id_a"), col("tok"))
    val b = filtered.select(col("id").as("id_b"), col("tok"))
    val common = a.join(b, "tok").filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("set_size").as("size_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("set_size").as("size_b")), "id_b")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("size_a") + col("size_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /**
   * MinHash signatures: k hash functions h_i(t) = (a_i * x + b_i) mod p over
   * the 64-bit token hash x (`xxhash64` — codegen'd). Signature = k mins per
   * doc, computed in ONE aggregation pass (k min() columns), not k passes.
   */
  def minhashSignature(docs: DataFrame, k: Int, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val p = 2147483647L // 2^31 - 1, Mersenne prime
    // deterministic coefficients from a fixed seed (splitmix-ish)
    def coef(i: Int, salt: Long): Long = {
      var z = i.toLong * 0x9E3779B97F4A7C15L + salt
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      math.abs(z ^ (z >>> 31)) % (p - 1) + 1
    }
    val posts = postings(docs, idCol, textCol)
      .withColumn("x", pmod(xxhash64(col("tok")), lit(p)))
    val mins = (0 until k).map { i =>
      min(pmod(col("x") * coef(i, 0xA5A5L) + coef(i, 0x5A5AL), lit(p))).as(s"h$i")
    }
    posts.groupBy(col("id")).agg(mins.head, mins.tail: _*)
  }

  /**
   * MinHash LSH near-dup candidate pairs: band the k-wide signature into
   * `bands` groups of `rowsPerBand`, hash each band, group by (band, hash).
   * Docs sharing any band bucket become candidates; `verify` re-checks exact
   * Jaccard on the candidate set only.
   */
  def minhashCandidates(
      docs: DataFrame, k: Int, bands: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val rows = k / bands
    val sig = minhashSignature(docs, k, idCol, textCol)
    val banded = sig.select(
      col("id"),
      posexplode(array((0 until bands).map { b =>
        xxhash64((b * rows until (b + 1) * rows).map(i => col(s"h$i")): _*)
      }: _*)).as(Seq("band", "band_hash")))
    val a = banded.select(col("band"), col("band_hash"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("band_hash"), col("id").as("id_b"))
    a.join(b, Seq("band", "band_hash")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** LSH candidates verified with exact Jaccard ≥ threshold. */
  def minhashPairs(
      docs: DataFrame, threshold: Double, k: Int = 64, bands: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val cands = minhashCandidates(docs, k, bands, idCol, textCol)
    val sets = docs.select(col(idCol).as("id"), TextAnalysis.tokenSet(col(textCol)).as("toks"))
    cands
      .join(sets.select(col("id").as("id_a"), col("toks").as("toks_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("toks").as("toks_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
          size(array_union(col("toks_a"), col("toks_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /**
   * SimHash 64-bit fingerprint: per token-hash bit j, sum +1/-1 over the doc's
   * tokens; bit j of the fingerprint = sign. One aggregation pass with 64 sum
   * columns, assembled with shiftleft/bitwise-or — all codegen'd.
   */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val posts = postings(docs, idCol, textCol).withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val agg = posts.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map { j =>
      shiftleft(when(col(s"b$j") > 0, 1L).otherwise(0L), j)
    }.reduce((x, y) => x.bitwiseOR(y))
    agg.select(col("id"), fp.as("simhash"))
  }

  /**
   * SimHash near-dup pairs with Hamming distance ≤ maxDist, via the standard
   * block trick: split the 64-bit fingerprint into `maxDist+1` chunks — any
   * pair within distance must share at least one exact chunk (pigeonhole).
   * Join on (chunk_index, chunk_value), then verify with bit_count(xor).
   */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val chunks = maxDist + 1
    val width = 64 / chunks
    val fp = simhash(docs, idCol, textCol)
    val banded = fp.select(
      col("id"), col("simhash"),
      posexplode(array((0 until chunks).map { c =>
        shiftright(col("simhash"), c * width).bitwiseAND((1L << width) - 1)
      }: _*)).as(Seq("chunk", "chunk_val")))
    val a = banded.select(col("chunk"), col("chunk_val"), col("id").as("id_a"), col("simhash").as("fp_a"))
    val b = banded.select(col("chunk"), col("chunk_val"), col("id").as("id_b"), col("simhash").as("fp_b"))
    a.join(b, Seq("chunk", "chunk_val")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
