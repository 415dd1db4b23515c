package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) curve helpers for multi-dimensional data layout.
 *
 * At 100 TB, a table sorted by one key prunes scans on that key only; a
 * predicate on a second key reads everything. Interleaving the key bits
 * and range-partitioning + sorting by the z-value clusters rows so every
 * file/row-group carries a TIGHT min/max envelope on BOTH dimensions —
 * parquet row-group stats pruning (and any file-stats layer above it)
 * then skips most of the data for predicates on either key. This is the
 * same layout idea behind Delta/Iceberg OPTIMIZE ZORDER, built from plain
 * Spark: the z-value is a fold of shift/and builtins (codegen'd, no UDF,
 * no custom expression), the layout is `repartitionByRange(z) +
 * sortWithinPartitions(z)`.
 *
 * The bit-interleave is expressed as a SUM of disjoint-bit terms
 * (`((a>>i)&1) << 2i` + `((b>>i)&1) << (2i+1)`), which any SQL engine
 * reproduces verbatim — [[interleaveSql]] emits the same arithmetic for
 * the DuckDB oracle.
 */
object ZOrder {

  /** z-value of two non-negative keys using the low `bits` bits of each. */
  def interleave(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    (0 until bits).map { i =>
      (shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** The identical arithmetic as a SQL fragment over column names `a`/`b`
   * (for oracle twins). */
  def interleaveSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) * ${1L << (2 * i)}) + ((($b >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  /** Rewrite a DataFrame into a z-clustered layout on two keys: range
   * partition by z then sort within partitions, so each output file is a
   * contiguous z-range with tight min/max on both dimensions. */
  def cluster(df: org.apache.spark.sql.DataFrame, a: Column, b: Column,
              bits: Int, partitions: Int): org.apache.spark.sql.DataFrame =
    df.withColumn("_z", interleave(a, b, bits))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
}
