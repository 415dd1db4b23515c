package graft.operators

import graft.core.ChangeEvent
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/**
 * Wire envelopes: native (Debezium payload), Debezium (`{"schema":null,
 * "payload":…}`), CloudEvents 1.0.
 *
 * Reference: crates/deltaforge-core/src/envelope/{native.rs:1-37,
 * debezium.rs:27-52, cloudevents.rs:42-110}; JSON encoding encoding/json.rs.
 * All `to_json(struct(...))` — codegen'd, no UDFs. Payload row images are
 * embedded as raw JSON: we parse them to maps only where the envelope needs
 * real nesting (CloudEvents `data`), otherwise they ride along as strings the
 * consumer re-parses, which preserves number fidelity.
 */
object Envelopes {

  /** Native envelope: the event payload itself (reference native.rs:1-37).
   * Encoded by the fused byte-level serializer — byte-identical to the
   * `to_json` twin below (property-spec-pinned), ~3× cheaper per event;
   * the envelope encode is the largest CPU term of the drain headline.
   *
   * Routed through [[graft.functions.JsonEncode.fusedJsonFor]] with the
   * declared ChangeEvent sub-schema so the ZERO-MATERIALIZATION template
   * engages on the unresolved `struct(...)`: leaves (including the big
   * before/after image strings) render straight from whole-stage codegen
   * into the output buffer, no intermediate 11-field struct row. (r16:
   * plain `fusedJson` on an unresolved struct used to silently route to
   * builtin to_json — the lazy Column wrapper lied `dataType=NullType`;
   * see GraftBridge.eagerExpression.) */
  def native: Column = {
    val sub = StructType(nativeFields.map(n => ChangeEvent.schema(n)))
    graft.functions.JsonEncode.fusedJsonFor(nativeStruct, sub)
  }

  private val nativeFields = Seq(
    "before", "after", "source", "op", "ts_ms", "transaction", "event_id",
    "tenant_id", "schema_version", "schema_sequence", "tags")

  /** The envelope struct both encoders serialize. */
  private[operators] def nativeStruct: Column = struct(
    col("before"), col("after"), col("source"), col("op"), col("ts_ms"),
    col("transaction"), col("event_id"), col("tenant_id"),
    col("schema_version"), col("schema_sequence"), col("tags"))

  /** `to_json` twin of [[native]] — the spec oracle for byte equality. */
  private[graft] def nativeViaToJson: Column = to_json(nativeStruct)

  /** Debezium envelope: `{"schema": null, "payload": <event>}` (debezium.rs:27-52). */
  def debezium: Column = concat(lit("""{"schema":null,"payload":"""), native, lit("}"))

  /**
   * CloudEvents 1.0 (cloudevents.rs:42-110):
   * `specversion,id,source,type=<prefix>.<verb>,time(RFC3339),subject,
   * data{before,after,op}`. Verb mapping: c→created u→updated d→deleted
   * r→snapshot t→truncated.
   */
  def cloudEvents(typePrefix: String): Column = {
    val verb =
      when(col("op") === ChangeEvent.Op.Create, "created")
        .when(col("op") === ChangeEvent.Op.Update, "updated")
        .when(col("op") === ChangeEvent.Op.Delete, "deleted")
        .when(col("op") === ChangeEvent.Op.Read, "snapshot")
        .otherwise("truncated")
    // fused byte-level encode (same routing as [[native]]): every leaf is a
    // string (before/after ride as raw-JSON strings by design), so the
    // zero-materialization template always engages; byte-identical to the
    // previous builtin to_json by the JsonEncode property spec
    val sub = StructType(Seq(
      StructField("specversion", StringType, nullable = false),
      StructField("id", StringType),
      StructField("source", StringType),
      StructField("type", StringType),
      StructField("time", StringType),
      StructField("subject", StringType),
      StructField("data", StructType(Seq(
        StructField("before", StringType), StructField("after", StringType),
        StructField("op", StringType))))))
    graft.functions.JsonEncode.fusedJsonFor(struct(
      lit("1.0").as("specversion"),
      col("event_id").as("id"),
      concat(lit("/"), col("source.connector"), lit("/"), col("source.name")).as("source"),
      concat(lit(typePrefix), lit("."), verb).as("type"),
      date_format((col("ts_ms") / 1000).cast("timestamp"),
        "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("time"),
      ChangeEvent.qualifiedTable.as("subject"),
      struct(col("before"), col("after"), col("op")).as("data")), sub)
  }

  /** Attach the serialized envelope as a `value` column. */
  def encode(df: DataFrame, envelope: Column): DataFrame =
    df.withColumn("value", envelope)
}
