package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/**
 * Deterministic sampling / resampling for training-data curation.
 *
 * Everything here is RNG-free: membership decisions derive from an
 * md5-bucket of the row id + seed, so results are identical across
 * engines (the DuckDB oracle reproduces them bit-for-bit), across
 * reruns, and across repartitionings — the property a 100 TB curation
 * pipeline actually needs (a `rand()` sample is neither auditable nor
 * re-creatable when a shard is re-processed after a failure).
 *
 * Scale design:
 *  - [[stratified]] and [[mixCorpus]] are single narrow scans — the
 *    per-stratum keep-rate is either a literal map lookup or a
 *    broadcast join with a stratum-count aggregate (strata counts are
 *    control-plane-sized). No shuffle of the corpus itself.
 *  - [[bottomK]] (the distributed reservoir-equivalent: per-stratum k
 *    smallest hashes = a uniform without-replacement sample of size k)
 *    shuffles once on the stratum key, and the `row_number <= k`
 *    filter is pushed into a map-side partial top-k by Spark's
 *    WindowGroupLimit rule — each input partition forwards at most k
 *    rows per stratum to the exchange, so a billion-row stratum costs
 *    k·partitions shuffle rows, not a billion.
 *  - [[deterministicShuffle]] produces a global pseudorandom total
 *    order WITHOUT a global sort: rows hash into `shards` independent
 *    shards, each shard sorts locally by the hash. (shard, pos) is a
 *    reproducible global permutation; shards are the parallel unit.
 *
 * Reference scope note: the reference engine (vnvo/deltaforge) has no
 * sampling surface — these operators are part of the SURVEY §2.8
 * north-star additions for LLM-data pipelines.
 */
object Sampling {

  /** Bucket in [0, buckets): first 15 hex digits of md5(id ":" seed),
   * mod buckets. 15 hex digits = 60 bits, fits a positive long.
   * DuckDB twin: `('0x' || substr(md5(id || ':' || seed), 1, 15))::BIGINT % buckets`. */
  def hashBucket(id: Column, seed: Int, buckets: Long = 1000000L): Column =
    pmod(
      conv(substring(md5(concat(id.cast(StringType), lit(":" + seed))), 1, 15), 16, 10)
        .cast(LongType),
      lit(buckets))

  /** 60-bit hash order key (no modulus) for [[deterministicShuffle]]. */
  def hashOrd(id: Column, seed: Int): Column =
    conv(substring(md5(concat(id.cast(StringType), lit(":" + seed))), 1, 15), 16, 10)
      .cast(LongType)

  /**
   * Per-stratum rate sampling: keep a row iff its hash bucket falls
   * under the stratum's rate. Strata absent from `rates` are dropped.
   * One narrow scan; the rate map rides along as a literal.
   */
  def stratified(
      docs: DataFrame,
      strataCol: String,
      rates: Map[String, Double],
      seed: Int,
      idCol: String = "doc_id"): DataFrame = {
    val bucket = hashBucket(col(idCol), seed)
    val rate = element_at(typedLit(rates), col(strataCol))
    docs
      .withColumn("bucket", bucket)
      .withColumn("rate", rate)
      .filter(col("rate").isNotNull && col("bucket") < col("rate") * 1000000.0)
  }

  /**
   * Uniform without-replacement sample of exactly min(k, |stratum|)
   * rows per stratum: the k smallest (hash, id) pairs. Equivalent in
   * distribution to a seeded reservoir sample, but deterministic and
   * mergeable (the bottom-k of a union is the bottom-k of the merged
   * bottom-ks — the same property [[graft.functions.ReservoirSample]]
   * exploits as an aggregate; this is the relational spelling).
   */
  def bottomK(
      docs: DataFrame,
      strataCol: String,
      k: Int,
      seed: Int,
      idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(strataCol).orderBy(col("h"), col(idCol))
    docs
      .withColumn("h", hashOrd(col(idCol), seed))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /**
   * Resample a corpus to target domain proportions (the "data mixing"
   * step before LLM pretraining). Given target shares p_d (summing to
   * ~1 over the domains to keep), the largest feasible output has
   * n_total = min_d(count_d / p_d) rows; each domain keeps
   * rate_d = p_d * n_total / count_d of its rows (<= 1, no
   * upsampling), selected by hash bucket. Domains absent from
   * `targets` are dropped.
   *
   * Two jobs over the corpus: one count aggregate (domain-sized
   * result), then one narrow filter with the rates broadcast back on.
   * All rate arithmetic is integer-count division — IEEE-exact and
   * engine-reproducible.
   */
  def mixCorpus(
      docs: DataFrame,
      domainCol: String,
      targets: Map[String, Double],
      seed: Int,
      idCol: String = "doc_id"): DataFrame = {
    val counts = docs
      .groupBy(domainCol).agg(count(lit(1)).as("c"))
      .withColumn("p", element_at(typedLit(targets), col(domainCol)))
      .filter(col("p").isNotNull)
    // min over domains of c/p — a 1-row aggregate, cross-joined back
    // (broadcast; both sides are domain-sized)
    val nTotal = counts.agg(min(col("c").cast(DoubleType) / col("p")).as("n_total"))
    val rates = counts.crossJoin(broadcast(nTotal))
      .withColumn("keep_rate",
        least(lit(1.0), col("p") * col("n_total") / col("c").cast(DoubleType)))
      .select(col(domainCol), col("keep_rate"))
    docs
      .join(broadcast(rates), domainCol)
      .withColumn("bucket", hashBucket(col(idCol), seed))
      .filter(col("bucket") < col("keep_rate") * 1000000.0)
  }

  /**
   * Reproducible global shuffle: (shard, pos) where shard =
   * hash mod `shards` and pos = rank of the 60-bit hash within the
   * shard. Reading shards in order, positions in order, is a uniform
   * pseudorandom permutation of the corpus — with per-shard sorts as
   * the only ordering work (no global range exchange, no driver
   * involvement). `shards` should be sized so a shard sorts in one
   * task's memory at the target scale.
   */
  def deterministicShuffle(
      docs: DataFrame,
      shards: Int,
      seed: Int,
      idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col("h"), col(idCol))
    docs
      .withColumn("h", hashOrd(col(idCol), seed))
      .withColumn("shard", pmod(col("h"), lit(shards.toLong)))
      .withColumn("pos", row_number().over(w))
  }
}
