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

  /** `${field}` references in a template. */
  private def templateRefs(tpl: String): Seq[String] =
    tpl.split("""(?=\$\{)|(?<=\})""").toSeq
      .filter(p => p.startsWith("${") && p.endsWith("}"))
      .map(_.drop(2).dropRight(1))

  /** Template over outbox row columns: `${field}` → extracted field value. */
  private def rowTemplate(tpl: String, field: String => Column): Column = {
    val parts = tpl.split("""(?=\$\{)|(?<=\})""").toSeq
    val cols = parts.filter(_.nonEmpty).map { p =>
      if (p.startsWith("${") && p.endsWith("}")) coalesce(field(p.drop(2).dropRight(1)), lit(""))
      else lit(p)
    }
    if (cols.isEmpty) lit("") else concat(cols: _*)
  }

  /** Topic cascade (reference outbox.rs:267-290): template → topic column →
   * default — falling THROUGH when a stage resolves to the empty string
   * (a template of pure missing refs must not yield an empty topic). */
  private def topicOn(cfg: Config, field: String => Column): Column = {
    val fromTemplate = cfg.topicTemplate.map { t =>
      val c = rowTemplate(t, field)
      when(length(c) > 0, c)
    }
    val fromColumn = when(length(field(cfg.topicCol)) > 0, field(cfg.topicCol))
    coalesce(Seq(fromTemplate, Some(fromColumn), Some(lit(cfg.defaultTopic))).flatten: _*)
  }

  def topic(cfg: Config): Column = topicOn(cfg, f)

  /** Key: template (non-empty) → aggregate_id (outbox.rs:240-259). */
  private def keyOn(cfg: Config, field: String => Column): Column =
    cfg.keyTemplate.map { t =>
      val c = rowTemplate(t, field)
      coalesce(when(length(c) > 0, c), field(cfg.aggregateIdCol))
    }.getOrElse(field(cfg.aggregateIdCol))

  def key(cfg: Config): Column = keyOn(cfg, f)

  /** df-* headers + extras (reference outbox.rs:165-210). A header is only
   * inserted when its value is present — the reference's `if let Some(v)`
   * guard; a missing outbox column must not emit a null-valued header. */
  private def headersOn(cfg: Config, field: String => Column): Column = {
    val base: Seq[Column] = Seq(
      lit("df-event-id"), coalesce(field("id"), col("event_id")),
      lit("df-aggregate-type"), field(cfg.aggregateTypeCol),
      lit("df-aggregate-id"), field(cfg.aggregateIdCol),
      lit("df-event-type"), field(cfg.eventTypeCol),
      lit("df-source-kind"), col("source.connector"))
    val extras = cfg.extraHeaderCols.toSeq.sortBy(_._1).flatMap { case (h, c) =>
      Seq(lit(h), field(c))
    }
    map_filter(map(base ++ extras: _*), (_, v) => v.isNotNull)
  }

  def headers(cfg: Config): Column = headersOn(cfg, f)

  private def requiredOkOn(cfg: Config, field: String => Column): Column =
    field(cfg.aggregateTypeCol).isNotNull && field(cfg.aggregateIdCol).isNotNull &&
      field(cfg.eventTypeCol).isNotNull && field(cfg.payloadCol).isNotNull

  /** Every outbox-row field the configured transform reads. */
  private def neededFields(cfg: Config): Seq[String] =
    (Seq("id", cfg.aggregateTypeCol, cfg.aggregateIdCol, cfg.eventTypeCol,
      cfg.payloadCol, cfg.topicCol) ++
      cfg.extraHeaderCols.values ++
      cfg.topicTemplate.toSeq.flatMap(templateRefs) ++
      cfg.keyTemplate.toSeq.flatMap(templateRefs)).distinct

  /**
   * Transform outbox rows into routed domain events: `after` replaced by the
   * payload, routing struct populated. Non-outbox events pass through.
   *
   * Parse-once: ALL outbox fields (aggregate columns, payload, topic column,
   * template refs, extra headers) are extracted by a single fused
   * [[graft.functions.JsonPathOps.JsonPathsGenerate]] pass over `after` —
   * the reference parses each event exactly once (outbox.rs:111-244) where
   * per-field `get_json_object` would re-parse ~10× per row. Non-outbox rows
   * skip the parse entirely (`when(applies, after)` gates the generator input).
   */
  def apply(cfg: Config = Config())(df: DataFrame): DataFrame = {
    import graft.functions.JsonPathOps.jsonPathsTuple
    val fields = neededFields(cfg)
    val names = fields.indices.map(i => s"__ob$i")
    val byField = fields.zip(names).toMap
    val field: String => Column = p => col(byField(p))

    val staged = df.select(col("*"),
      jsonPathsTuple(when(applies, col("after")), fields).as(names))

    val routing = struct(
      topicOn(cfg, field).as("topic"),
      keyOn(cfg, field).as("key"),
      headersOn(cfg, field).as("headers"),
      lit(cfg.rawPayload).as("raw_payload"))
    val keepGate = if (cfg.strict) applies && requiredOkOn(cfg, field) else applies
    staged.filter(!col("source.schema").eqNullSafe("__outbox") || keepGate)
      .withColumn("routing", when(applies, routing).otherwise(col("routing")))
      .withColumn("after", when(applies, field(cfg.payloadCol)).otherwise(col("after")))
      .drop(names: _*)
  }

  /** Strict-mode violations side-channel (reference errors list missing fields). */
  def strictViolations(cfg: Config)(df: DataFrame): DataFrame =
    df.filter(applies && !requiredOkOn(cfg, f))
      .withColumn("missing_fields", concat_ws(",",
        when(f(cfg.aggregateTypeCol).isNull, lit(cfg.aggregateTypeCol)),
        when(f(cfg.aggregateIdCol).isNull, lit(cfg.aggregateIdCol)),
        when(f(cfg.eventTypeCol).isNull, lit(cfg.eventTypeCol)),
        when(f(cfg.payloadCol).isNull, lit(cfg.payloadCol))))
}
