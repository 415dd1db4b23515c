package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Regression pins for the r17 one-exchange rewrite of the CDC materialize
 * trio (cdc_upsert / cdc_changelog / cdc_scd2) — VERDICT r16 task #1.
 *
 * The r16 shape paid, per query: 3 parquet scans (the versionedOrders
 * union), a hash exchange on pk for the window, and a trailing global
 * orderBy whose range exchange shuffled the FULL-WIDTH output and whose
 * bounds-sampling job re-executed the window chain. The r17 shape
 * range-partitions the 2-column SOURCE once: RangePartitioning(pk)
 * satisfies both the window's ClusteredDistribution(pk) and the final
 * ORDER BY's OrderedDistribution(pk…), so the plan carries exactly ONE
 * exchange — of the narrow source — and the bounds sampling reads the raw
 * scan. All of that is invisible to the DuckDB oracle (values unchanged),
 * so these specs pin:
 *
 *  1. PLAN: exactly one Exchange, it is a range partitioning, and its
 *     child subtree is the raw FileScan (no Generate/Window/union below
 *     it — the sampling job must not re-execute the compute chain).
 *  2. ROWS: output row-for-row equal (same order) to the r16 union +
 *     window + orderBy shape, reconstructed inline here.
 */
class MaterializePlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The r16 versionedOrders shape (3-scan union), verbatim. */
  private def unionVersionedOrders(): DataFrame = {
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val v1 = o.select(col("o_orderkey").as("pk"), lit(1L).as("version"),
      lit("c").as("op"), col("o_totalprice").as("total"))
    val v2 = o.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("pk"), lit(2L).as("version"),
        lit("u").as("op"), (col("o_totalprice") + 10).as("total"))
    val v3 = o.filter(col("o_orderkey") % 10 === 9)
      .select(col("o_orderkey").as("pk"), lit(3L).as("version"),
        lit("d").as("op"), lit(null).cast("double").as("total"))
    v1.union(v2).union(v3).withColumn("ts_ms", col("version"))
  }

  /** name -> (query under test, r16 reference shape over the union input) */
  private def referenceOf(name: String): DataFrame = name match {
    case "cdc_upsert" =>
      operators.Materialize.upsert(unionVersionedOrders(), col("pk"),
        col("version"), Map("pk" -> col("pk"), "total" -> col("total")))
        .orderBy("pk")
    case "cdc_changelog" =>
      operators.Materialize.changelog(unionVersionedOrders(), col("version"),
        Map("pk" -> col("pk"), "total" -> col("total")))
        .orderBy("pk", "_version")
    case "cdc_scd2" =>
      val w = Window.partitionBy("pk").orderBy("version")
      unionVersionedOrders()
        .withColumn("valid_to", lead(col("version"), 1).over(w))
        .filter(col("op") =!= "d")
        .select(col("pk"), col("total"), col("version").as("valid_from"),
          col("valid_to"),
          when(col("valid_to").isNull, 1).otherwise(0).as("is_current"))
        .orderBy("pk", "valid_from")
  }

  private val cases = Seq("cdc_upsert", "cdc_changelog", "cdc_scd2")

  for (name <- cases) {
    test(s"$name: one narrow range exchange on the raw scan; rows identical to the union+orderBy shape") {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val lines = plan.linesIterator.toVector

      val exchanges = lines.zipWithIndex.filter(_._1.contains("Exchange "))
      assert(exchanges.size == 1,
        s"expected exactly one exchange, got ${exchanges.size}:\n$plan")
      val (exLine, exIdx) = exchanges.head
      assert(exLine.contains("rangepartitioning"),
        s"the single exchange must be a range partitioning:\n$plan")
      // the bounds-sampling job must read the raw scan, not the chain
      val exIndent = exLine.indexOf("+-") max exLine.indexOf(":-")
      val subtree = lines.drop(exIdx + 1).takeWhile { l =>
        val i = l.indexOf("+-") max l.indexOf(":-")
        i < 0 || i > exIndent
      }
      assert(subtree.exists(l => l.contains("FileScan") || l.contains("Scan parquet")),
        s"range exchange no longer reads the raw scan:\n$plan")
      for (heavy <- Seq("Generate", "Exchange", "Window", "Union", "Sort "))
        assert(!subtree.exists(_.contains(heavy)),
          s"compute chain ('$heavy') below the range exchange — " +
            s"the bounds-sampling job would re-execute it:\n$plan")
      // one scan total: the union shape read orders.parquet three times
      val scans = lines.count(l => l.contains("Scan parquet") || l.contains("FileScan"))
      assert(scans == 1, s"expected one parquet scan, got $scans:\n$plan")

      // ROW PARITY, order included: the final orderBy key sets are unique
      // per query (pk / pk,_version / pk,valid_from), so ordered equality
      // is deterministic on both arms.
      val got = df.collect().map(_.toSeq).toSeq
      val want = referenceOf(name).collect().map(_.toSeq).toSeq
      assert(got.size == want.size, s"row count ${got.size} != ${want.size}")
      assert(got == want, {
        val firstDiff = got.zip(want).indexWhere { case (a, b) => a != b }
        s"$name rows differ from the union+orderBy shape at index $firstDiff: " +
          s"got=${got.lift(firstDiff)} want=${want.lift(firstDiff)}"
      })
      assert(df.columns.toSeq == referenceOf(name).columns.toSeq,
        "output schema/column order changed")
    }
  }
}
