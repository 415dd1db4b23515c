package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join — the canonical operator vanilla Spark lacks:
 * each left row matches the single right row with the greatest
 * `rightTs <= leftTs` for its key (the "latest dimension version at event
 * time" lookup behind rate tables, SCD reads, and funnel analyses).
 *
 * Spark-first shape: UNION the two sides, ONE hash exchange on the key,
 * and a running `last(_, ignoreNulls)` window per key ordered by
 * `(ts, side)` with an explicit ROWS frame — right rows sort before left
 * rows at equal timestamps, so `rightTs == leftTs` matches (at-or-before
 * semantics, same as DuckDB/QuestDB ASOF). Cost is one shuffle + one
 * sort per side — the same class as a sort-merge equi-join; there is no
 * range-condition row explosion and no per-row binary search, and the
 * window state is O(1) per row (the running struct), so the plan
 * survives arbitrarily skewed time distributions. A left row with no
 * prior right row gets a NULL match struct (left-outer semantics).
 *
 * Ambiguity note: two right rows on the same (key, ts) are tie-broken by
 * their struct's field order via the ROWS frame (last one in sort wins)
 * — deterministic given deterministic input order is not guaranteed, so
 * callers with duplicate (key, ts) dimension rows should dedupe first
 * (engines differ on this case; DuckDB ASOF picks an arbitrary one too).
 */
object AsOfJoin {

  /**
   * @return the left rows (original columns) plus a `asof` struct of all
   *         right columns except the key (null when no match)
   */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String): DataFrame = {
    val rCols = right.columns.filterNot(_ == key)
    val lStructT = org.apache.spark.sql.types.StructType(
      left.schema.fields)
    val rStructT = org.apache.spark.sql.types.StructType(
      right.schema.fields.filterNot(_.name == key))
    val l = left.select(
      col(key).as("_k"), col(leftTs).cast("long").as("_ts"), lit(1).as("_side"),
      lit(null).cast(rStructT).as("_r"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("_l"))
    val r = right.select(
      col(key).as("_k"), col(rightTs).cast("long").as("_ts"), lit(0).as("_side"),
      struct(rCols.map(col).toIndexedSeq: _*).as("_r"),
      lit(null).cast(lStructT).as("_l"))
    val w = Window.partitionBy("_k").orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_l.*"), col("_match").as("asof"))
  }
}
