package graft.llm

import graft.functions.TextHashOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Substring-level exact deduplication — the "duplicated span" analysis of
 * Lee et al. 2021 (Deduplicating Training Data Makes Language Models
 * Better, arXiv:2107.06499), re-expressed relationally: instead of a
 * distributed suffix array, fixed-width token n-grams at EVERY position
 * are the span probes. A w-token window that occurs ≥ `minCount` times in
 * the corpus (across documents or repeated inside one) marks its token
 * range [pos, pos+w-1] as duplicated; per document the marked ranges are
 * interval-unioned into covered-token counts and span counts, and the
 * keep/drop decision is a coverage-ratio gate.
 *
 * Reference analog: the reference ships document-level fuzzy dedup only
 * (crates/processors — filter/flatten surface); this operator family is
 * part of the repo's training-data extension, with a recursive-free SQL
 * oracle (window LAG interval union).
 *
 * Scale shape (100 TB): one narrow scan computes positional gram hashes
 * (fused native expression, no higher-order functions); the posting table
 * is O(total tokens) rows of (doc, pos, hash) — the same magnitude every
 * posting-join miner in [[Dedup]] already carries; duplicated grams fall
 * out of one map-side-combined count; the coverage window partitions by
 * document over ONLY the duplicated positions (dup-light corpora shuffle
 * almost nothing into it). No driver-side state, no per-pair work, no
 * suffix array.
 */
object SubstringDedup {

  /**
   * Per-document duplicated-span statistics.
   *
   * Output: (doc_id, n_tokens, dup_grams, dup_tokens, n_dup_spans,
   * dup_ratio, keep) — `dup_tokens` is the exact size of the union of all
   * duplicated w-token ranges (adjacent/overlapping ranges merge;
   * `n_dup_spans` counts the merged runs, a gap strictly wider than `w`
   * starts a new span), `dup_ratio` = dup_tokens / n_tokens, and
   * `keep` = dup_ratio <= `maxDupRatio`.
   *
   * Interval union without an interval type: duplicated start positions
   * sorted per doc contribute `min(w, pos - lag(pos))` covered tokens
   * (`w` for the first) — exact for fixed-width ranges.
   */
  def spanStats(docs: DataFrame, w: Int = 16, minCount: Long = 2L,
                maxDupRatio: Double = 0.2,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(w >= 2, s"window w=$w must be >= 2 tokens")
    val grams = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("doc_id"),
        // fused byte-level positional gram hashes (r15) — value-identical
        // to xxhash64Array(textNgramsAll(text, w)), zero string allocation
        posexplode(TextHashOps.textNgramsXxh64All(col(textCol), w)).as(Seq("pos", "h")))
    // posexplode drops docs shorter than w tokens; they re-enter with
    // zero counts via the left join onto the doc spine below.
    val dupGrams = grams.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount).select("h")
    // the duplicated-gram set is the ≥minCount TAIL of the gram histogram —
    // sublinear by construction (measured: 8.7k of 187k distinct grams at
    // sf0.1) — so it BROADCASTS and the corpus positional stream is never
    // shuffled by hash; before, the join strategy was left to post-agg size
    // estimates, which shuffled the full (doc_id, pos, h) frame by h. The
    // count's partial-agg exchange is now the only corpus-sized shuffle.
    val dupStarts = grams.join(broadcast(dupGrams), "h").select("doc_id", "pos")
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val delta = col("pos") - lag("pos", 1).over(byPos)
    val covered = dupStarts
      .select(col("doc_id"),
        when(delta.isNull, lit(w)).otherwise(least(lit(w), delta)).as("contrib"),
        when(delta.isNull || delta > w, 1L).otherwise(0L).as("newspan"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("dup_grams"), sum("contrib").as("dup_tokens"),
        sum("newspan").as("n_dup_spans"))
    val spine = docs.select(col(idCol).as("doc_id"),
      TextHashOps.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    spine.join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_grams"), lit(0L)).as("dup_grams"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        round(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          greatest(col("n_tokens"), lit(1L)).cast("double"), 4).as("dup_ratio"),
        (coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          greatest(col("n_tokens"), lit(1L)).cast("double") <= maxDupRatio).as("keep"))
  }
}
