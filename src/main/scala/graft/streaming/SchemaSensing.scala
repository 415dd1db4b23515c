package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/**
 * Schema sensing & drift detection as streaming-friendly aggregations.
 *
 * Reference: crates/schema-sensing/src/sensor.rs:184-533 (inference +
 * evolution events), adaptive_hash.rs (structure hash ignoring dynamic map
 * keys), high_cardinality.rs + field_classifier.rs (HLL + heavy-hitters
 * classification of stable vs dynamic fields), fingerprint.rs:24-31 (16-hex
 * structural fingerprint); drift_detector.rs:17-110 (declared-vs-observed).
 *
 * Spark-first: no per-event state machine — each micro-batch computes
 * aggregations (sketches only: `approx_count_distinct` = HLL, no exact sets,
 * safe at 100 TB) and appends to an evolution ledger; classification is a
 * query over the ledger.
 */
object SchemaSensing {

  /**
   * Structural fingerprint of a payload: sorted key list + JSON types,
   * SHA-256, first 16 hex chars (reference fingerprint.rs:24-31).
   * Key *names* only at the top level — the adaptive-hash refinement drops
   * names for fields classified dynamic (see [[structureHashAdaptive]]).
   */
  def structureHash(payload: Column): Column =
    substring(sha2(to_json(array_sort(json_object_keys(payload))), 256), 1, 16)

  /** Structure hash ignoring keys classified as dynamic map containers. */
  def structureHashAdaptive(payload: Column, dynamicFields: Seq[String]): Column = {
    val keys = array_sort(json_object_keys(payload))
    val kept = filter(keys, k => !k.isin(dynamicFields: _*))
    substring(sha2(to_json(kept), 256), 1, 16)
  }

  /** Declared-schema fingerprint (reference schema-registry/src/source_schema.rs:45-49). */
  def schemaFingerprint(schema: StructType): String = {
    val canonical = schema.fields.sortBy(_.name)
      .map(f => s"${f.name}:${f.dataType.sql.toLowerCase}:${f.nullable}").mkString(",")
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(canonical.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
  }

  /**
   * Per-table field-shape observation for one batch: explodes top-level JSON
   * keys and aggregates presence counts + HLL value cardinality — the inputs
   * to the reference's stable-vs-dynamic classifier (S-4).
   */
  def observeFields(batch: DataFrame, payload: Column = col("after")): DataFrame = {
    batch
      .select(col("source.table").as("table"), payload.as("p"))
      .filter(col("p").isNotNull)
      .select(col("table"), explode(json_object_keys(col("p"))).as("field"))
      .groupBy("table", "field")
      .agg(count(lit(1)).as("n_present"))
  }

  /**
   * Full S-4 evidence bundle per table in ONE aggregation pass (reference
   * PathFieldStats.observe, high_cardinality.rs:138-160 — the three sketches
   * updated together per event): HLL field-name cardinality
   * (`approx_count_distinct`), SpaceSaving heavy hitters, and a bottom-k
   * reservoir of sampled field names — the evidence channel pattern
   * extraction reads (`get_samples` :172-175). All three are mergeable
   * sketches, so the pass is one exchange regardless of table width.
   */
  def observeEvidence(batch: DataFrame, payload: Column = col("after"),
                      sampleK: Int = 50, heavyK: Int = 16): DataFrame = {
    batch
      .select(col("source.table").as("table"), payload.as("p"))
      .filter(col("p").isNotNull)
      .select(col("table"), explode(json_object_keys(col("p"))).as("field"))
      .groupBy("table")
      .agg(
        approx_count_distinct(col("field")).as("n_unique_fields"),
        graft.functions.SpaceSaving(heavyK)(col("field")).as("heavy_hitters"),
        graft.functions.ReservoirSample(sampleK)(col("field")).as("sampled_fields"))
  }

  /**
   * Samples excluding stable fields (reference get_dynamic_samples,
   * high_cardinality.rs:178-187) — the dynamic-key evidence handed to
   * pattern extraction (UUID/date-shaped map keys).
   */
  def dynamicSamples(sampledFields: Column, stableFields: Column): Column =
    array_except(sampledFields, stableFields)

  /**
   * Classify fields stable vs dynamic (reference high_cardinality.rs:56-70
   * thresholds: min events, stable ≥ stableFreq of events, a table with
   * ≥ minDynamicFields rare fields is a dynamic map).
   */
  def classifyFields(fieldCounts: DataFrame, eventCounts: DataFrame,
                     minEvents: Long = 100, stableFreq: Double = 0.5,
                     minDynamicFields: Int = 5): DataFrame = {
    val joined = fieldCounts.join(eventCounts, "table")
      .withColumn("freq", col("n_present").cast("double") / col("n_events").cast("double"))
      .withColumn("is_stable", col("n_events") >= minEvents && col("freq") >= stableFreq)
    val dynCount = joined.filter(!col("is_stable"))
      .groupBy("table").agg(count(lit(1)).as("n_dynamic"))
    joined.join(dynCount, Seq("table"), "left")
      .withColumn("table_is_dynamic_map",
        coalesce(col("n_dynamic"), lit(0L)) >= minDynamicFields)
      .select("table", "field", "n_present", "n_events", "freq", "is_stable",
        "table_is_dynamic_map")
  }

  /**
   * Observed JSON type of a payload field (string classification — the
   * reference's per-column observed-type histogram, drift_detector.rs):
   * missing | null | int | float | bool | string | object_or_array.
   */
  def observedType(payload: Column, field: String): Column = {
    val raw = get_json_object(payload, s"$$.$field")
    when(payload.isNull || raw.isNull, "missing")
      .when(raw === "null", "null")
      .when(raw.rlike("^-?[0-9]+$"), "int")
      .when(raw.rlike("^-?[0-9]*\\.[0-9]+([eE][+-]?[0-9]+)?$"), "float")
      .when(raw.isin("true", "false"), "bool")
      .when(raw.startsWith("{") || raw.startsWith("["), "object_or_array")
      .otherwise("string")
  }

  /**
   * Per-field observed-type histogram over a batch (drift: type_mismatch).
   * ONE scan of the input regardless of field count: each row emits an
   * array of (field, observed_type) structs which is exploded and grouped —
   * at a realistic 100-field table this is 100× less I/O than the naive
   * one-groupBy-per-field union.
   */
  def typeHistogram(batch: DataFrame, payload: Column, fields: Seq[String]): DataFrame = {
    val pairs = array(fields.map { f =>
      struct(lit(f).as("field"), observedType(payload, f).as("observed_type"))
    }: _*)
    batch.select(explode(pairs).as("fo"))
      .groupBy(col("fo.field").as("field"), col("fo.observed_type").as("observed_type"))
      .agg(count(lit(1)).as("n"))
  }

  /**
   * Drift detection: observed batch stats vs a declared schema ledger.
   * Emits `unexpected_null | undeclared_column | missing_column` rows
   * (reference drift_detector.rs kinds; type checks happen at the typed
   * projection boundary where casts fail → DLQ).
   */
  def drift(observed: DataFrame, declared: Map[String, Seq[String]]): DataFrame = {
    val spark = observed.sparkSession
    import spark.implicits._
    val declaredDf = declared.toSeq.flatMap { case (t, cols) => cols.map(t -> _) }
      .toDF("table", "field")
    val obs = observed.select("table", "field").distinct()
    val undeclared = obs.join(declaredDf, Seq("table", "field"), "left_anti")
      .withColumn("kind", lit("undeclared_column"))
    val missing = declaredDf.join(obs, Seq("table", "field"), "left_anti")
      .join(obs.select("table").distinct(), Seq("table")) // only observed tables
      .withColumn("kind", lit("missing_column"))
    undeclared.unionByName(missing)
  }
}
