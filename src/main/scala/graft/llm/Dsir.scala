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

  /**
   * Per-raw-doc DSIR log importance weights.
   *
   * `isTarget` splits `docs`; output is one row per NON-target doc:
   * (doc_id, n_feats, logw) with logw rounded to 4 decimals.
   *
   * Cost shape (r15, fused): the md5 feature stream — the data-sized term —
   * runs exactly TWICE, and NEITHER pass explodes a row per occurrence:
   *
   *  - pass A: one narrow scan emits a per-doc bucket-count VECTOR
   *    ([[TextHashOps.dsirBucketCounts]], value-identical to counting the
   *    exploded `pmod(md5h60(gram), B)` stream) and [[graft.functions
   *    .VectorAgg.vectorSum]] reduces it map-side — the only exchange
   *    carries ≤ 2 rows of B partial sums (the previous shape shuffled the
   *    full occurrence stream into a B-row groupBy);
   *  - the ≤ B-row log-ratio model is computed ON THE DRIVER with the
   *    bit-identical arithmetic of the old Catalyst expression chain
   *    (same double divides, same Math.log, same HALF_UP round-to-9 then
   *    Decimal(·,10) rendering — both steps replicated mechanically), as
   *    scale-10 fixed-point longs;
   *  - pass B: one narrow scan computes each raw doc's (n_feats, Σ llr)
   *    against the literal model ([[TextHashOps.dsirLogWeight]]); the long
   *    sum of scaled values IS the old Decimal(·,10) join+agg sum —
   *    order-free and exact — so no explode, no broadcast join, no
   *    doc-keyed exchange.
   *
   * The previous exploded shape (r14) shuffled ~2×(uni+bigram occurrences)
   * rows through a hash agg and a broadcast join per run; this one ships
   * 2·B doubles. Output is value-identical (spec-pinned row-for-row vs the
   * exploded r14 shape in DsirSpec, plus the DuckDB oracle row-hash).
   */
  /**
   * @param rangeSortById emit output globally sorted by `idCol` WITHOUT a
   *   trailing `orderBy`: a global sort ABOVE the weight projection makes
   *   the range-exchange's bounds-sampling job re-execute the whole md5
   *   feature chain (the cdc_binlog_decode r14 finding — measured 2×
   *   task-CPU); here the range exchange runs on the RAW doc rows (the
   *   sampling job prunes to the id column) and the narrow weight compute +
   *   in-partition sort run once, above it. Order contract identical to
   *   `.orderBy(idCol)` — range partitions are globally ordered and each is
   *   sorted within.
   */
  def importanceWeights(docs: DataFrame, isTarget: Column, buckets: Int = 1024,
                        idCol: String = "doc_id", textCol: String = "text",
                        rangeSortById: Boolean = false): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    // pass A: both add-1 models from ONE narrow scan + a 2-group vector agg
    val sums = docs.repartition(par)
      .select(isTarget.as("t"),
        TextHashOps.dsirBucketCounts(col(textCol), buckets).as("c"))
      .groupBy("t").agg(graft.functions.VectorAgg.vectorSum(col("c")).as("s"))
      .collect()
    def side(flag: Boolean): Array[Long] =
      sums.find(r => !r.isNullAt(0) && r.getBoolean(0) == flag)
        .map(_.getSeq[Double](1).map(_.toLong).toArray)
        .getOrElse(new Array[Long](buckets))
    val ct = side(true)
    val cr = side(false)
    val tn = ct.sum
    val rn = cr.sum
    // driver llr model, replicating the old expression chain step by step:
    // x = log((ct+1)/(tn+B)) - log((cr+1)/(rn+B))  [double]
    // r9 = round(x, 9)                              [Spark Round: HALF_UP on
    //                                                BigDecimal.valueOf(x)]
    // llr = cast(r9 as decimal(·,10))               [Double.toString-based]
    val llrScaled = Array.tabulate(buckets) { b =>
      val x = math.log((ct(b) + 1L).toDouble / (tn + buckets).toDouble) -
        math.log((cr(b) + 1L).toDouble / (rn + buckets).toDouble)
      val r9 = new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
      new java.math.BigDecimal(java.lang.Double.toString(r9))
        .setScale(10, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    }
    // pass B: narrow per-doc weight against the literal model
    val raw = docs.filter(!isTarget)
    val spread =
      if (rangeSortById) raw.repartitionByRange(par, col(idCol))
      else raw.repartition(par)
    val out = spread
      .select(col(idCol).as("doc_id"),
        TextHashOps.dsirLogWeight(col(textCol), llrScaled, buckets).as("_r"))
      .select(col("doc_id"),
        coalesce(col("_r.n_feats"), lit(0L)).as("n_feats"),
        round(coalesce(col("_r.w"), lit(0)).cast(DoubleType), 4).as("logw"))
    if (rangeSortById) out.sortWithinPartitions("doc_id") else out
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
