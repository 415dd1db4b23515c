package graft.llm

import graft.functions.TextHashOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Data Selection via Importance Resampling — DSIR (Xie et al. 2023,
 * arXiv:2302.03169): select raw-corpus documents that look like a small
 * target corpus by importance weighting in a hashed n-gram feature space.
 *
 *  1. Features: unigrams + bigrams hashed into `buckets` buckets
 *     (md5-60 of the gram, mod B — bit-reproducible in any engine).
 *  2. Two bag-of-ngrams models: add-1-smoothed bucket probabilities on
 *     the target and on the raw corpus.
 *  3. Per raw doc, the log importance weight is the sum over its feature
 *     OCCURRENCES of log(p_target[b] / p_raw[b]).
 *  4. Gumbel top-k on the weights = a deterministic sample WITHOUT
 *     replacement from the importance distribution (the paper's
 *     resampling step, RNG-free via the md5 uniform).
 *
 * Scale shape (100 TB): feature extraction is a narrow fused-expression
 * scan (no higher-order functions); both models are <= B rows and
 * BROADCAST back onto the feature stream; the per-doc sum is one
 * map-side-combinable aggregation keyed by doc. Nothing driver-side but
 * the B-row model.
 *
 * Numeric discipline for the oracle: per-bucket log-ratios are rounded
 * to 9 decimals then carried as DECIMAL(28,10) — double summation order
 * is engine-dependent, decimal summation is exact and order-free — and
 * only the final per-doc sum returns to DOUBLE.
 */
object Dsir {

  /** (doc_id, t, b) feature-bucket occurrences with the target flag:
   * unigrams + bigrams, with multiplicity, hashed md5-60 mod `buckets`.
   * The flag is computed in the SAME projection so both passes over the
   * stream know the doc's side without any semi/anti join. */
  private def featureOccurrences(docs: DataFrame, isTarget: Column, buckets: Int,
                                 idCol: String, textCol: String): DataFrame =
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("doc_id"), isTarget.as("t"),
        explode(concat(
          TextHashOps.md5Hash60Array(TextHashOps.textNgramsAll(col(textCol), 1)),
          TextHashOps.md5Hash60Array(TextHashOps.textNgramsAll(col(textCol), 2))))
          .as("h"))
      .select(col("doc_id"), col("t"), pmod(col("h"), lit(buckets.toLong)).as("b"))

  /**
   * Per-raw-doc DSIR log importance weights.
   *
   * `isTarget` splits `docs`; output is one row per NON-target doc:
   * (doc_id, n_feats, logw) with logw rounded to 4 decimals.
   *
   * Cost shape (r15): the md5 feature stream — the data-sized term — runs
   * exactly TWICE: pass A aggregates BOTH models (target and raw bucket
   * counts) in one map-side-combined groupBy, with the corpus totals
   * derived from the materialized B-row count table rather than their own
   * corpus passes; pass B joins the broadcast log-ratio model back onto
   * the stream for the per-doc sums. The previous shape re-executed the
   * feature chain five times (two models + two totals + per-doc).
   */
  def importanceWeights(docs: DataFrame, isTarget: Column, buckets: Int = 1024,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val feats = featureOccurrences(docs, isTarget, buckets, idCol, textCol)
    // pass A: both add-1 models in ONE aggregation; <= `buckets` rows,
    // eagerly cut (localCheckpoint) so the totals and the log-ratio model
    // derive from the B-row table, not from fresh corpus passes
    val counts = feats.groupBy("b").agg(
      sum(when(col("t"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("t"), 1L).otherwise(0L)).as("cr"))
      .localCheckpoint(true)
    val tots = counts.agg(sum(col("ct")).as("tn"), sum(col("cr")).as("rn"))
    val llr = counts
      .crossJoin(broadcast(tots))
      .select(col("b"),
        round(
          log((col("ct") + lit(1)).cast(DoubleType) /
            (col("tn") + lit(buckets)).cast(DoubleType)) -
          log((col("cr") + lit(1)).cast(DoubleType) /
            (col("rn") + lit(buckets)).cast(DoubleType)), 9)
          .cast(DecimalType(28, 10)).as("llr"))
    // pass B: the broadcast model back onto the raw side of the stream
    val perDoc = feats.filter(!col("t")).join(broadcast(llr), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum(col("llr")).as("w"))
    docs.filter(!isTarget).select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        round(coalesce(col("w"), lit(0)).cast(DoubleType), 4).as("logw"))
  }

  /**
   * Gumbel top-k importance resampling over [[importanceWeights]]:
   * score = logw + Gumbel(md5-uniform(doc_id, seed)); the k largest
   * scores are a without-replacement sample from the importance
   * distribution (Gumbel-max trick). Deterministic: the uniform is
   * u = (hashOrd + 0.5) / 2^60.
   */
  def gumbelTopK(weights: DataFrame, k: Int, seed: Int = 29): DataFrame = {
    val u = (Sampling.hashOrd(col("doc_id"), seed).cast(DoubleType) + lit(0.5)) /
      lit(math.pow(2.0, 60))
    // top-k SELECTION by the exact score (round(,4) ties must not decide
    // membership at the k boundary); the final ROW ORDER is a contractual
    // Sort on the retained output columns — a projection after
    // orderBy().limit() only preserves order through TakeOrderedAndProject's
    // incidental behavior, not by plan contract (the oracle twin orders the
    // same way: exact LIMIT inside, rounded-score ORDER BY outside).
    weights
      .select(col("doc_id"), col("logw"),
        round(col("logw") - log(-log(u)), 4).as("score"),
        (col("logw") - log(-log(u))).as("_score_exact"))
      .orderBy(col("_score_exact").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("logw"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }
}
