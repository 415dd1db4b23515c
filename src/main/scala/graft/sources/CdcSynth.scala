package graft.sources

import graft.core.ChangeEvent
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deterministic CDC-ification of snapshot tables.
 *
 * The reference tails MySQL binlogs / PG WAL; the test environment has no live
 * database, so — like the reference's own chaos/bench harness replays a backlog
 * (crates/chaos/src/scenarios/backlog_drain.rs) — we deterministically wrap the
 * driver's parquet tables as change events. Every derived value is a pure
 * function of the row so a DuckDB oracle can reproduce it.
 *
 * Op assignment (seeded by the primary key, matching the c/u/d mix of a
 * TPC-C-ish workload, reference crates/chaos/src/scenarios/tpcc.rs:7-14):
 * `pk % 10`: 0..5 → 'c', 6..8 → 'u' (with a `before` image), 9 → 'd'.
 */
object CdcSynth {

  /** op = CASE pk%10 ... as a column; mirrors the oracle SQL expression. */
  def opFor(pk: Column): Column =
    when(pmod(pk, lit(10)) <= 5, lit(ChangeEvent.Op.Create))
      .when(pmod(pk, lit(10)) <= 8, lit(ChangeEvent.Op.Update))
      .otherwise(lit(ChangeEvent.Op.Delete))

  /** SQL (DuckDB) equivalent of [[opFor]], for oracle queries. */
  def opForSql(pk: String): String =
    s"CASE WHEN ($pk % 10) <= 5 THEN 'c' WHEN ($pk % 10) <= 8 THEN 'u' ELSE 'd' END"

  /**
   * Wrap a snapshot table as change events. `after` is the full row as JSON;
   * `before` is present for updates/deletes (the same row image — synthetic
   * history). All payload columns keep their names.
   */
  def changeEvents(
      table: DataFrame,
      db: String,
      tableName: String,
      pkCol: String,
      connector: String = "mysql",
      tsCol: Option[String] = None,
      payloadOverride: Option[Column] = None): DataFrame = {
    // A real backlog arrives as many segments/partitions; the driver's test
    // parquet is often ONE sub-4m file → one task, which serializes every
    // downstream per-row JSON encode. Spread under-partitioned inputs —
    // the narrow base row moves BEFORE the payload encode, so the wrap and
    // everything after runs at executor parallelism.
    val par = table.sparkSession.sparkContext.defaultParallelism
    val spread = if (table.rdd.getNumPartitions < par) table.repartition(par) else table
    val pk = col(pkCol)
    val op = opFor(pk)
    val payload = payloadOverride.getOrElse(
      to_json(struct(spread.columns.map(col).toIndexedSeq: _*)))
    val tsMs = tsCol
      .map(c => (col(c).cast(TimestampType).cast(DoubleType) * 1000).cast(LongType))
      .getOrElse(lit(1700000000000L) + pk)

    val source = struct(
      lit("graft-0.1.0").as("version"),
      lit(connector).as("connector"),
      lit("test-db").as("name"),
      tsMs.as("ts_ms"),
      lit(db).as("db"),
      lit(null).cast(StringType).as("schema"),
      lit(tableName).as("table"),
      lit(false).as("snapshot"),
      lit(1L).as("server_id"),
      lit(null).cast(StringType).as("gtid"),
      lit("binlog.000001").as("file"),
      pk.cast(LongType).as("pos"),
      lit(null).cast(StringType).as("lsn"),
      pk.cast(LongType).as("tx_id"),
      pk.cast(LongType).as("sequence"))

    ChangeEvent.conform(
      spread.select(
        when(op.isin(ChangeEvent.Op.Update, ChangeEvent.Op.Delete), payload).as("before"),
        when(op =!= ChangeEvent.Op.Delete, payload).as("after"),
        source.as("source"),
        op.as("op"),
        tsMs.as("ts_ms"),
        concat(lit(s"$db.$tableName:"), pk.cast(StringType)).as("event_id"),
        lit(true).as("tx_end")))
  }

  /**
   * Snapshot read as `op='r'` events (reference mysql_snapshot.rs:156-331).
   * At scale this is `spark.read.jdbc(partitionColumn=pk, ...)`; here it reads
   * the driver parquet directly. Partition-pruned, column-pruned by Catalyst.
   */
  def snapshot(spark: SparkSession, dir: String, tableName: String, db: String, pkCol: String): DataFrame = {
    val t = spark.read.parquet(s"$dir/$tableName.parquet")
    changeEvents(t, db, tableName, pkCol)
      .withColumn("after", coalesce(col("after"), col("before"))) // full image for every row
      .withColumn("before", lit(null).cast(StringType))
      .withColumn("op", lit(ChangeEvent.Op.Read))
  }
}
