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
   * A declared column for drift checking (reference drift_detector.rs
   * ColumnSchemaInfo): SQL type string, nullability, optional numeric
   * range for `value_out_of_range`.
   */
  case class DeclaredColumn(name: String, sqlType: String, nullable: Boolean = true,
                            minValue: Option[Double] = None, maxValue: Option[Double] = None) {
    def isJsonLike: Boolean = {
      val t = sqlType.toLowerCase
      t == "json" || t == "jsonb"
    }
  }

  /**
   * Observed JSON category vs declared SQL type — the reference's
   * check_type_mismatch decision table (drift_detector.rs:346-412):
   * booleans only fit bool/tinyint/bit; integers fit int OR float
   * families; floats never fit integer columns; strings only clash with
   * strictly-numeric columns (everything else string-serializes);
   * objects/arrays only fit JSON-like columns. Returns the observed
   * category when it mismatches, null when compatible (null/missing are
   * nullability's business, not type's).
   */
  def typeMismatchKind(observed: Column, sqlType: String): Column = {
    val t = sqlType.toLowerCase
    val boolOk = Set("bool", "boolean", "tinyint", "bit")(t)
    val expectsInt = Set("int", "integer", "bigint", "smallint", "tinyint",
      "mediumint", "serial", "bigserial")(t)
    val expectsFloat = Set("float", "double", "real", "decimal", "numeric")(t)
    val strictlyNumeric = Set("int", "integer", "bigint", "float", "double")(t)
    val jsonLike = t == "json" || t == "jsonb"
    val no = lit(null).cast("string")
    when(observed === "bool", if (boolOk) no else lit("bool"))
      .when(observed === "int", if (expectsInt || expectsFloat) no else lit("int"))
      .when(observed === "float", if (expectsInt) lit("float") else no)
      .when(observed === "string", if (strictlyNumeric) lit("string") else no)
      .when(observed === "object_or_array", if (jsonLike) no else lit("object_or_array"))
      .otherwise(no)
  }

  /**
   * Full drift detection over a JSON payload batch — ALL six reference
   * kinds (drift_detector.rs DriftType) as one DataFrame of
   * `(column_name, kind, expected, observed, n)`:
   *
   *  - `type_mismatch`      per-value check_type_mismatch categories
   *  - `value_out_of_range` declared numeric [min,max] violated
   *  - `unexpected_null`    non-nullable column null/absent
   *  - `json_structure_change` a JSON-like column's key-set structure
   *                         is not unique across the batch (n = count of
   *                         distinct structures)
   *  - `undeclared_column`  payload key not in the declared schema
   *  - `missing_column`     declared column absent from every row
   *
   * Scale shape: each row emits a bounded array of per-declared-column
   * entries (one Generate, no per-column scans); everything aggregates in
   * ONE `groupBy` over (field, kind, expected, observed) with a distinct
   * structure count, plus one explode of payload keys for undeclared
   * columns. No driver-side state; all sketch-free exact counts.
   */
  def driftTyped(batch: DataFrame, payload: Column,
                 declared: Seq[DeclaredColumn]): DataFrame = {
    val noS = lit(null).cast("string")
    def entry(name: String, kind: Column, expected: Column, observed: Column,
              structure: Column) =
      struct(lit(name).as("field"), kind.as("kind"), expected.as("expected"),
        observed.as("observed"), structure.as("structure"))

    val entries = declared.flatMap { c =>
      val obs = observedType(payload, c.name)
      val mismatch = typeMismatchKind(obs, c.sqlType)
      val typeE = entry(c.name,
        when(mismatch.isNotNull, lit("type_mismatch")).otherwise(noS),
        lit(c.sqlType), mismatch, noS)
      val nullE =
        if (c.nullable) Nil
        else Seq(entry(c.name,
          when(obs.isin("null", "missing"), lit("unexpected_null")).otherwise(noS),
          lit("NOT NULL"), lit("NULL"), noS))
      val rangeE =
        if (c.minValue.isEmpty && c.maxValue.isEmpty) Nil
        else {
          val v = get_json_object(payload, s"$$.${c.name}").cast("double")
          val oor = c.minValue.map(m => v < m).getOrElse(lit(false)) ||
            c.maxValue.map(m => v > m).getOrElse(lit(false))
          Seq(entry(c.name,
            when(v.isNotNull && oor, lit("value_out_of_range")).otherwise(noS),
            lit(s"[${c.minValue.getOrElse("-inf")},${c.maxValue.getOrElse("inf")}]"),
            lit("out_of_range"), noS))
        }
      val structE =
        if (!c.isJsonLike) Nil
        else {
          val sub = get_json_object(payload, s"$$.${c.name}")
          Seq(entry(c.name,
            when(sub.isNotNull && sub.startsWith("{"), lit("_structure")).otherwise(noS),
            lit("stable structure"), lit("n_structures"),
            to_json(array_sort(json_object_keys(sub)))))
        }
      // presence probe drives missing_column (declared, never seen)
      val presenceE = entry(c.name, lit("_presence"), lit("declared"),
        when(obs === "missing", lit("missing")).otherwise(lit("present")), noS)
      Seq(typeE, presenceE) ++ nullE ++ rangeE ++ structE
    }

    val exploded = batch.select(explode(array(entries: _*)).as("e"))
      .select(col("e.field").as("field"), col("e.kind").as("kind"),
        col("e.expected").as("expected"), col("e.observed").as("observed"),
        col("e.structure").as("structure"))
      .filter(col("kind").isNotNull)
    val agg = exploded
      .groupBy("field", "kind", "expected", "observed")
      .agg(count(lit(1)).as("n"), count_distinct(col("structure")).as("ns"))

    val kinds = agg.filter(!col("kind").isin("_structure", "_presence"))
      .select(col("field").as("column_name"), col("kind"), col("expected"),
        col("observed"), col("n"))
    val structureChanged = agg.filter(col("kind") === "_structure" && col("ns") > 1)
      .select(col("field").as("column_name"),
        lit("json_structure_change").as("kind"), col("expected"), col("observed"),
        col("ns").as("n"))
    val missing = agg.filter(col("kind") === "_presence")
      .groupBy("field")
      .agg(sum(when(col("observed") === "present", col("n")).otherwise(0L)).as("np"),
        sum(when(col("observed") === "missing", col("n")).otherwise(0L)).as("nm"))
      .filter(col("np") === 0L)
      .select(col("field").as("column_name"), lit("missing_column").as("kind"),
        lit("declared").as("expected"), lit("never present").as("observed"),
        col("nm").as("n"))
    val undeclared = batch
      .select(explode(json_object_keys(payload)).as("field"))
      .filter(!col("field").isin(declared.map(_.name): _*))
      .groupBy("field").agg(count(lit(1)).as("n"))
      .select(col("field").as("column_name"), lit("undeclared_column").as("kind"),
        lit("(not declared)").as("expected"), lit("present").as("observed"), col("n"))

    kinds.unionByName(structureChanged).unionByName(missing).unionByName(undeclared)
  }

  /**
   * Presence-only drift (ledger form): observed batch stats vs a declared
   * schema ledger. Emits `undeclared_column | missing_column` rows; the
   * per-value kinds live in [[driftTyped]].
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
