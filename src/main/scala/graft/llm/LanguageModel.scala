package graft.llm

import graft.functions.TextHashOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * Corpus-trained n-gram language-model scoring — the Gopher/CCNet-style
 * "does this document look like fluent corpus text" filter, without an
 * external LM artifact: train bigram statistics ON the corpus, score
 * each document against them.
 *
 * Per document:
 *  - n_bigrams — total bigram positions;
 *  - n_rare    — positions whose conditional probability
 *                P(w2|w1) = c(w1 w2) / c(w1 ·) falls below `minP`
 *                (probability threshold, NOT a count threshold — counts
 *                scale with the corpus, probabilities don't, so the same
 *                cut means the same thing at sf0.01 and at 100 TB);
 *  - rare_frac — n_rare / n_bigrams (the filter signal);
 *  - min_p     — the document's least-supported transition.
 *
 * Determinism: every output is integer counts, one division, and a min
 * over exact-division doubles — all order-independent and IEEE-pinned,
 * so the DuckDB oracle hash-matches with no rounding.
 *
 * Scale design: bigrams come from the native multiset kernel
 * ([[TextHashOps.textNgramsAll]], one fused walk per row, no HOFs);
 * the two count tables are classic map-side-combined aggregations with
 * vocabulary-sized results; scoring is ONE shuffle join of the exploded
 * corpus against the bigram table (the unigram denominator is folded in
 * by keying the count table on the full bigram and joining the prefix
 * table onto the vocabulary-sized side, never onto the corpus twice).
 */
object LanguageModel {

  def bigramRarity(
      docs: DataFrame,
      minP: Double = 0.03,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val grams = docs.select(
      col(idCol),
      explode(TextHashOps.textNgramsAll(col(textCol), 2)).as("bg"))
    // vocabulary-sized model table; w1 = bigram prefix (tokens are
    // space-free, so substring_index is exact)
    val big = grams.groupBy("bg").agg(count(lit(1)).as("c2"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    // unigram denominator DERIVED from the bigram table as a window over
    // the vocab-sized rows: c1(w1) = Σ c2 over bigrams with prefix w1 —
    // every bigram position contributes exactly one prefix occurrence, so
    // the sums are identical longs to re-counting the corpus, and BOTH the
    // third full explode+aggregate pass over the corpus AND the uni join
    // are gone (r17: the before-plan ran explode(text_ngrams_all) THREE
    // times; a first rewrite derived uni as a separate aggregate, but its
    // broadcast build re-executed the corpus pass — the window form keeps
    // the whole denominator computation inside the one vocab-sized table)
    val model = big.select(col("bg"),
      (col("c2").cast(DoubleType) /
        sum(col("c2")).over(Window.partitionBy("w1")).cast(DoubleType)).as("p"))
    // model stays vocabulary-sized (sublinear in the corpus), so the
    // scoring join BROADCASTS it: the corpus gram stream is never shuffled
    // — before, the join strategy was left to size estimates, which at
    // sf0.01 broadcast the CORPUS side and at scale degrade to shuffling
    // every gram position by bg
    grams.join(broadcast(model), "bg")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("p") < minP, 1L).otherwise(0L)).as("n_rare"),
        min(col("p")).as("min_p"))
      .withColumn("rare_frac",
        col("n_rare").cast(DoubleType) / col("n_bigrams").cast(DoubleType))
  }
}
