package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Typed flat lake projection — the reference's Arrow envelope derivation.
 *
 * Reference: crates/deltaforge-core/src/encoding/arrow_schema.rs:31-139 —
 * flat columns `op, op_ts, source_db, source_schema, source_table,
 * source_position, source_snapshot, event_id, schema_version, tx_id,
 * before_<col>…, after_<col>…` (all payload columns nullable), typed from
 * the DECLARED schema (the ledger version the event carries), with
 * decimal-as-string → DecimalType and `{"_base64":…}` → binary at the typed
 * boundary (encoder.rs:1-19).
 *
 * Spark-first: `from_json(payload, ledgerSchema)` once per image, then a
 * flat select — pure Catalyst, whole-stage codegen'd, and the parquet writer
 * gets a stable flat schema per (table, schema_version).
 */
object LakeProjection {

  /** Decode a `{"_base64": "..."}`-wrapped binary payload field. */
  def binaryField(payload: Column, field: String): Column =
    unbase64(get_json_object(payload, s"$$.$field._base64"))

  /**
   * Project events of one table (one declared-schema version) to the flat
   * lake schema. `payloadSchema` comes from the schema ledger AT the event's
   * schema_sequence (SURVEY §7.4 risk 5 — never "latest").
   *
   * Parse-once: each image is parsed in its OWN projection step and the
   * flat columns read struct fields off the resulting attribute. Writing
   * `from_json(col).getField(f)` per column instead lets the
   * OptimizeCsvJsonExprs rule rewrite every access into a separately
   * schema-pruned from_json — measured 5 parses per row where 2 suffice
   * (CollapseProject keeps the staging projection because from_json is
   * non-cheap and multiply referenced, so this shape is stable).
   *
   * The parse itself is [[graft.functions.JsonDecode.fusedFromJson]] — a
   * single-pass byte-level kernel, from_json-identical by spec, that
   * replaces Jackson for the flat primitive schemas ledger versions
   * declare (r12 verdict #8: the two image parses were the largest CPU
   * term of the cdc decode/project family at ×10). Non-flat schemas fall
   * back to builtin from_json inside fusedFromJson.
   */
  def apply(events: DataFrame, payloadSchema: StructType): DataFrame = {
    import graft.functions.JsonDecode
    val staged = events.select(col("*"),
      JsonDecode.fusedFromJson(col("before"), payloadSchema).as("__lake_before"),
      JsonDecode.fusedFromJson(col("after"), payloadSchema).as("__lake_after"))
    val before = col("__lake_before")
    val after = col("__lake_after")
    val meta = Seq(
      col("op"),
      col("ts_ms").as("op_ts"),
      col("source.db").as("source_db"),
      col("source.schema").as("source_schema"),
      col("source.table").as("source_table"),
      to_json(struct(col("source.file"), col("source.pos"), col("source.lsn"),
        col("source.sequence"))).as("source_position"),
      coalesce(col("source.snapshot"), lit(false)).as("source_snapshot"),
      col("event_id"),
      col("schema_version"),
      col("transaction.id").as("tx_id"))
    val payloadCols = payloadSchema.fieldNames.toSeq.flatMap { f =>
      Seq(before.getField(f).as(s"before_$f"), after.getField(f).as(s"after_$f"))
    }
    staged.select(meta ++ payloadCols: _*)
  }
}
