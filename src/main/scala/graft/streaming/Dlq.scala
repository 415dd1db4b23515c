package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Dead-letter queue as a bad-record side-output.
 *
 * Reference: crates/runner/src/dlq.rs:23-200 + journal entry shape
 * crates/deltaforge-core/src/journal.rs:13-100 (`seq, timestamp, pipeline,
 * stream:"dlq", event_id, source_cursor, event, payload_truncated, meta{...}`).
 *
 * Spark-first: instead of a per-event try/catch in a runtime loop, an
 * eligibility predicate splits the batch declaratively; the DLQ side is
 * appended to a parquet journal with the reference's metadata, payloads
 * truncated to `maxPayloadBytes` (dlq.rs payload truncation).
 */
object Dlq {

  case class Config(
      pipeline: String,
      sinkId: String,
      path: String,
      maxPayloadBytes: Int = 65536)

  /** journal-entry projection of a failed event. */
  def entry(cfg: Config, errorKind: String, errorMessage: Column): Column = struct(
    unix_millis(current_timestamp()).as("timestamp"),
    lit(cfg.pipeline).as("pipeline"),
    lit("dlq").as("stream"),
    col("event_id").as("event_id"),
    to_json(struct(col("source.file"), col("source.pos"), col("source.lsn"),
      col("source.sequence"))).as("source_cursor"),
    substring(to_json(struct(col("before"), col("after"), col("op"), col("ts_ms"))),
      1, cfg.maxPayloadBytes).as("event"),
    (length(to_json(struct(col("before"), col("after")))) > cfg.maxPayloadBytes)
      .as("payload_truncated"),
    struct(lit(cfg.sinkId).as("sink_id"), lit(errorKind).as("error_kind"),
      errorMessage.as("error_message"), lit(1).as("attempts")).as("meta"))

  /**
   * Split a batch on an eligibility predicate: rows failing `isGood` go to
   * the DLQ journal, the rest continue to the sink. Returns the good side.
   */
  def splitAndJournal(cfg: Config, batch: DataFrame, isGood: Column,
                      errorKind: String, errorMessage: Column): DataFrame = {
    val bad = batch.filter(!coalesce(isGood, lit(false)))
    val n = bad.limit(1).count() // cheap existence probe before a write job
    if (n > 0) {
      bad.select(entry(cfg, errorKind, errorMessage).as("e")).select("e.*")
        .write.mode("append").parquet(cfg.path)
    }
    batch.filter(coalesce(isGood, lit(false)))
  }

  /** Common eligibility check: payload must parse as a JSON object. */
  def jsonParses(payload: Column): Column =
    payload.isNull || try_parse_json(payload).isNotNull
}
