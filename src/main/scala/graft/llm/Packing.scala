package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Token-budget sequence packing: assign each document to a fixed-size
 * training batch ("pack") by running an exclusive prefix sum of token
 * counts within a shard and dividing by the budget.
 *
 * Scale design (100 TB): the window runs per shard, so shards are the
 * parallel unit — the default scales with the cluster
 * (4 × defaultParallelism) instead of a hard-coded constant that would
 * funnel a 1000-executor job through a handful of giant window
 * partitions. Pass an explicit shard count when the output must be
 * reproducible across differently-sized clusters (packing is shard-local,
 * so pack ids depend on the shard count).
 */
object Packing {

  /**
   * @param budget    TARGET tokens per pack — greedy/approximate, not a hard
   *                  cap: a document whose tokens straddle a pack boundary
   *                  stays in the earlier pack (packs can exceed the budget
   *                  by up to one document; a doc larger than the budget
   *                  occupies its floor-assigned pack alone-ish). Callers
   *                  sizing fixed training batches must size for
   *                  budget + max_doc_tokens, or pre-split long docs
   * @param shards    number of independent packing shards; None = 4×parallelism
   * @param tokens    token-count column (defaults to whitespace word count of `text`)
   * @return (idCol, shard, n_tokens, pack_id) — pack_id is shard-local
   */
  def packSequences(
      docs: DataFrame,
      budget: Long,
      shards: Option[Int] = None,
      idCol: String = "doc_id",
      tokens: Column = null): DataFrame = {
    val nShards = shards.getOrElse(4 * docs.sparkSession.sparkContext.defaultParallelism)
    val tok = Option(tokens).getOrElse(TextAnalysis.nWords(col("text")))
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(
        col(idCol),
        pmod(col(idCol), lit(nShards.toLong)).as("shard"),
        tok.cast(LongType).as("n_tokens"))
      .withColumn("pack_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budget).cast(LongType))
  }
}
