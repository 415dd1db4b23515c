package graft.operators

import graft.core.ChangeEvent
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Transactional-outbox processor.
 *
 * Reference: crates/processors/src/outbox.rs:48-345 (transform :111-244, topic
 * cascade :267-290) + capture sentinel `source.schema == "__outbox"`
 * (crates/sources/src/mysql/mysql_event.rs:236-239).
 *
 * Semantics: for events from outbox tables — drop non-INSERTs; extract
 * `aggregate_type / aggregate_id / event_type / payload` (column names
 * configurable); topic = template cascade (explicit template → topic column →
 * default); key = key template or aggregate_id; `df-*` headers plus extra
 * headers mapped from payload columns; `raw_payload` passes the payload
 * through opaque. Strict mode drops rows with missing required fields to a
 * side-channel (`strictViolations`). Pure Catalyst: filter + select over
 * `get_json_object`, `map()` for headers, `concat` for templates.
 */
object OutboxProcessor {

  case class Config(
      aggregateTypeCol: String = "aggregate_type",
      aggregateIdCol: String = "aggregate_id",
      eventTypeCol: String = "event_type",
      payloadCol: String = "payload",
      topicCol: String = "topic",
      topicTemplate: Option[String] = None, // e.g. "${aggregate_type}.${event_type}"
      keyTemplate: Option[String] = None,
      defaultTopic: String = "outbox",
      extraHeaderCols: Map[String, String] = Map.empty, // header name -> outbox column
      rawPayload: Boolean = false,
      strict: Boolean = false)

  private def f(name: String): Column = get_json_object(col("after"), "$." + name)

  /** Rows this processor applies to: outbox-captured inserts. */
  def applies: Column =
    col("source.schema") === "__outbox" && col("op") === ChangeEvent.Op.Create

  /** Template over outbox row columns: `${field}` → get_json_object(after, $.field). */
  private def rowTemplate(tpl: String): Column = {
    val parts = tpl.split("""(?=\$\{)|(?<=\})""").toSeq
    val cols = parts.filter(_.nonEmpty).map { p =>
      if (p.startsWith("${") && p.endsWith("}")) coalesce(f(p.drop(2).dropRight(1)), lit(""))
      else lit(p)
    }
    if (cols.isEmpty) lit("") else concat(cols: _*)
  }

  /** Topic cascade (reference outbox.rs:267-290): template → topic column → default. */
  def topic(cfg: Config): Column = {
    val fromTemplate = cfg.topicTemplate.map(rowTemplate)
    val fromColumn = when(length(f(cfg.topicCol)) > 0, f(cfg.topicCol))
    coalesce(Seq(fromTemplate, Some(fromColumn), Some(lit(cfg.defaultTopic))).flatten: _*)
  }

  def key(cfg: Config): Column =
    cfg.keyTemplate.map(rowTemplate).getOrElse(f(cfg.aggregateIdCol))

  /** df-* headers + extras (reference outbox.rs:165-210). */
  def headers(cfg: Config): Column = {
    val base: Seq[Column] = Seq(
      lit("df-event-id"), coalesce(f("id"), col("event_id")),
      lit("df-aggregate-type"), f(cfg.aggregateTypeCol),
      lit("df-aggregate-id"), f(cfg.aggregateIdCol),
      lit("df-event-type"), f(cfg.eventTypeCol),
      lit("df-source-kind"), col("source.connector"))
    val extras = cfg.extraHeaderCols.toSeq.sortBy(_._1).flatMap { case (h, c) =>
      Seq(lit(h), f(c))
    }
    map(base ++ extras: _*)
  }

  private def requiredOk(cfg: Config): Column =
    f(cfg.aggregateTypeCol).isNotNull && f(cfg.aggregateIdCol).isNotNull &&
      f(cfg.eventTypeCol).isNotNull && f(cfg.payloadCol).isNotNull

  /**
   * Transform outbox rows into routed domain events: `after` replaced by the
   * payload, routing struct populated. Non-outbox events pass through.
   */
  def apply(cfg: Config = Config())(df: DataFrame): DataFrame = {
    val routing = struct(
      topic(cfg).as("topic"),
      key(cfg).as("key"),
      headers(cfg).as("headers"),
      lit(cfg.rawPayload).as("raw_payload"))
    val keepGate = if (cfg.strict) applies && requiredOk(cfg) else applies
    df.filter(!col("source.schema").eqNullSafe("__outbox") || keepGate)
      .withColumn("routing", when(applies, routing).otherwise(col("routing")))
      .withColumn("after", when(applies, f(cfg.payloadCol)).otherwise(col("after")))
  }

  /** Strict-mode violations side-channel (reference errors list missing fields). */
  def strictViolations(cfg: Config)(df: DataFrame): DataFrame =
    df.filter(applies && !requiredOk(cfg))
      .withColumn("missing_fields", concat_ws(",",
        when(f(cfg.aggregateTypeCol).isNull, lit(cfg.aggregateTypeCol)),
        when(f(cfg.aggregateIdCol).isNull, lit(cfg.aggregateIdCol)),
        when(f(cfg.eventTypeCol).isNull, lit(cfg.eventTypeCol)),
        when(f(cfg.payloadCol).isNull, lit(cfg.payloadCol))))
}
