package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Regression pins for the 13 `rangeSorted` queries (r15 rewrite).
 *
 * The rewrite's win — the range exchange's bounds-sampling job reads the
 * cheap RAW scan instead of re-executing the narrow compute chain (measured
 * ~2× task-CPU when the sort sits above the chain) — is invisible to the
 * DuckDB oracle: a future edit reintroducing a trailing `orderBy` would
 * stay value-correct and silently double the cost. These specs pin BOTH
 * halves of the contract on the sf0.001 tables:
 *
 *  1. PLAN: exactly one range-partitioning exchange, no global Sort, and
 *     the exchange's child is the raw FileScan (the sampling job therefore
 *     reads the scan, not the chain).
 *  2. ORDER: the collected output is globally non-decreasing in the
 *     query's contractual sort key — this is what breaks if an `outKeys`
 *     expression stops being monotone in the range key (the ADVICE r15
 *     convention risk: e.g. cdc_outbox sorts by event_key.cast(long),
 *     monotone only because aggregate_id == o_orderkey).
 */
class RangeSortedPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** query name -> contractual global sort key over the OUTPUT columns */
  private val cases: Seq[(String, Column)] = Seq(
    "cdc_filter" -> col("o_orderkey"),
    "cdc_filter_changed" -> col("o_orderkey"),
    "cdc_flatten" -> col("order__id"),
    "cdc_outbox" -> col("event_key").cast("long"),
    "cdc_json_extract" -> col("o_orderkey"),
    "cdc_nested_decode" -> col("o_orderkey"),
    "cdc_envelope" -> col("o_orderkey"),
    "cdc_lake_project" -> coalesce(col("after_o_orderkey"), col("before_o_orderkey")),
    "text_metrics" -> col("doc_id"),
    "text_langid" -> col("doc_id"),
    "text_quality" -> col("doc_id"),
    "text_repetition" -> col("doc_id"),
    "text_pii" -> col("doc_id"))

  private def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString

  for ((name, key) <- cases) {
    test(s"$name: one range exchange on the raw scan, no global sort, output globally ordered") {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = planOf(df)
      val lines = plan.linesIterator.toVector

      val rangeIdx = lines.zipWithIndex.filter(_._1.contains("Exchange rangepartitioning"))
      assert(rangeIdx.size == 1,
        s"expected exactly one range exchange, got ${rangeIdx.size}:\n$plan")
      // a trailing .orderBy would reappear as Sort [...], true (global)
      assert(!"""Sort \[[^\]]*\], true""".r.findFirstIn(plan).isDefined,
        s"global sort reintroduced above the chain:\n$plan")
      // the sampling job must read the raw scan: the exchange's child
      // subtree is the FileScan plus at most trivial pushed filters /
      // prunes — never the compute chain (Generate / json encode / aggs).
      // Indentation delimits the subtree in the plan string.
      val (exLine, exIdx) = rangeIdx.head
      val exIndent = exLine.indexOf("+-") max exLine.indexOf(":-")
      val subtree = lines.drop(exIdx + 1).takeWhile { l =>
        val i = l.indexOf("+-") max l.indexOf(":-")
        i < 0 || i > exIndent
      }
      assert(subtree.exists(l => l.contains("FileScan") || l.contains("Scan parquet")),
        s"range exchange no longer reads the raw scan:\n$plan")
      for (heavy <- Seq("Generate", "Exchange", "invoke(", "HashAggregate",
                        "Window", "Sort ", "json"))
        assert(!subtree.exists(_.contains(heavy)),
          s"compute chain ('$heavy') moved below the range exchange — " +
            s"the bounds-sampling job would re-execute it:\n$plan")

      // ORDER CONTRACT: identical to chain(src).orderBy(key) — range
      // partitions are globally ordered, each sorted within; collect
      // preserves partition order. Non-monotone outKeys break exactly this.
      val keys = df.select(key.cast("double").as("k")).collect().map(_.getDouble(0))
      assert(keys.nonEmpty)
      val breaches = keys.sliding(2).count(w => w.length == 2 && w(0) > w(1))
      assert(breaches == 0,
        s"$name output not globally sorted: $breaches inversions over ${keys.length} rows")
    }
  }
}
