package graft.operators

import graft.core.ChangeEvent
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Warehouse materialization of a change stream — the ClickHouse sink's two
 * modes re-expressed relationally.
 *
 * Reference: crates/sinks/src/clickhouse/ddl.rs:17-67 — `upsert` →
 * `ReplacingMergeTree(_version,_deleted) ORDER BY pk` (latest row per key
 * wins, deletes tombstone) vs `changelog` → `MergeTree ORDER BY (pk,_version)`
 * (full history with `_op/_version/_deleted/_source_ts` meta columns,
 * project.rs:35).
 *
 * Scale notes: `upsert` is one hash-partitioned window (single shuffle on the
 * key); at 100 TB this is the standard "merge-on-read compaction" shape —
 * partition by key, no driver state, AQE handles skew. `changelog` is a pure
 * narrow projection (no shuffle at all).
 */
object Materialize {

  /** Meta columns shared by both modes (reference clickhouse/project.rs:35). */
  def withMeta(df: DataFrame, versionCol: Column): DataFrame = df
    .withColumn("_op", col("op"))
    .withColumn("_version", versionCol.cast("long"))
    .withColumn("_deleted", when(col("op") === ChangeEvent.Op.Delete, 1).otherwise(0))
    .withColumn("_source_ts", col("ts_ms"))

  /**
   * Changelog mode: every change as a history row (no shuffle).
   * `payloadCols` projects typed columns out of the JSON images: for deletes
   * the row image comes from `before`, else `after`.
   */
  def changelog(events: DataFrame, versionCol: Column, payloadCols: Map[String, Column]): DataFrame = {
    val projected = payloadCols.foldLeft(withMeta(events, versionCol)) {
      case (acc, (name, c)) => acc.withColumn(name, c)
    }
    projected.select((payloadCols.keys.toSeq.sorted.map(col) ++
      Seq(col("_op"), col("_version"), col("_deleted"), col("_source_ts"))): _*)
  }

  /**
   * Upsert mode: latest version per key wins; tombstoned keys dropped —
   * ReplacingMergeTree(_version,_deleted) semantics at read time.
   */
  def upsert(events: DataFrame, keyCol: Column, versionCol: Column, payloadCols: Map[String, Column]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(versionCol.desc)
    val ranked = payloadCols.foldLeft(withMeta(events, versionCol)) {
      case (acc, (name, c)) => acc.withColumn(name, c)
    }.withColumn("_rn", row_number().over(w))
    ranked.filter(col("_rn") === 1 && col("_deleted") === 0)
      .select(payloadCols.keys.toSeq.sorted.map(col) :+ col("_version"): _*)
  }
}
