package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities for hot-key joins at scale.
 *
 * AQE's skew-join splitting handles sort-merge skew at runtime; salting is
 * the plan-level tool when one side has pathological hot keys (e.g. a
 * near-dup cluster of millions of identical documents, or a single tenant
 * producing most CDC events): replicate the small side `salt`×, scatter the
 * big side's hot keys across salt buckets, join on (key, salt).
 */
object Skew {

  /**
   * Salted equi-join: `big ⋈ small` on `key`, with the big side scattered
   * over `salt` buckets and the small side replicated to every bucket.
   * Result equals `big.join(small, key)` row-for-row.
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0)
    val saltedBig = big.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
    val saltedSmall = small.withColumn("_salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Top-N hottest keys with counts — the monitoring query behind salting. */
  def hotKeys(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key")).limit(topN)
}
