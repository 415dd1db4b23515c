package graft.llm

import graft.functions.TextScanOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * Corpus-relevance scoring for a fixed query-term set (the "keep pages
 * that look like my target domain" stage of training-data curation):
 * BM25 with a rational idf.
 *
 * Engine-reproducibility note: classic BM25 uses ln((N-df+0.5)/(df+0.5)
 * + 1); `ln` is the ONE operation in the formula whose last-ulp result
 * is not pinned by IEEE 754 across math libraries, so the oracle twin
 * could hash-mismatch. We use the un-logged odds ratio
 * idf = (N - df + 0.5) / (df + 0.5) instead — strictly monotone in df,
 * so rankings for a single term are identical and multi-term scores
 * just weight rare terms more aggressively than the log variant. Every
 * remaining op (+,-,*,/) is IEEE-exact, making scores bit-identical in
 * any conforming engine.
 *
 * Scale design: document length and per-term tf come from the fused
 * single-pass byte-walk kernels ([[TextScanOps]]) — one scan per row
 * regardless of term count, whole-stage codegen'd, no HOFs, no token
 * array materialization. Corpus stats (N, avgdl, df per term) are one
 * tiny aggregate cross-joined back as a broadcast — the corpus itself
 * never shuffles. Per-term scores sum in the FIXED literal order of
 * `terms` (left-associated), so the result is reproducible regardless
 * of plan shape.
 */
object Relevance {

  /**
   * @return docs + (dl, tf_<term>..., score) — top-k by (score desc, id)
   *         if k > 0, else all rows scored.
   */
  def bm25(
      docs: DataFrame,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      k: Int = 0,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val tfArr = TextScanOps.listHits(col(textCol), terms.map(Seq(_)))
    val dl = TextScanOps.metrics(col(textCol), Nil).getField("n_words")
    val scored = docs.withColumn("_tf", tfArr).withColumn("dl", dl)
    // corpus stats: one row, broadcast back on
    val statAggs = count(lit(1)).cast(DoubleType).as("n_docs") +:
      avg(col("dl").cast(DoubleType)).as("avgdl") +:
      terms.indices.map(i =>
        sum(when(element_at(col("_tf"), i + 1) > 0, 1L).otherwise(0L))
          .cast(DoubleType).as(s"df_$i"))
    val stats = scored.agg(statAggs.head, statAggs.tail: _*)
    val withStats = scored.crossJoin(broadcast(stats))
    def termScore(i: Int): Column = {
      val tf = element_at(col("_tf"), i + 1).cast(DoubleType)
      val idf = (col("n_docs") - col(s"df_$i") + lit(0.5)) / (col(s"df_$i") + lit(0.5))
      val denom = tf + lit(k1) * (lit(1.0) - lit(b) +
        lit(b) * col("dl").cast(DoubleType) / col("avgdl"))
      idf * (tf * lit(k1 + 1.0)) / denom
    }
    val score = terms.indices.map(termScore).reduceLeft(_ + _)
    val cols = col(idCol) +: col("dl").cast("long").as("dl") +:
      terms.indices.map(i => element_at(col("_tf"), i + 1).cast("long").as(s"tf_${terms(i)}")) :+
      score.as("score")
    val out = withStats.select(cols: _*)
    if (k > 0) out.orderBy(col("score").desc, col(idCol)).limit(k) else out
  }
}
