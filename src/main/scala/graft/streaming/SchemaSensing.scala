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
   *
   * KNOWN BLINDSPOT (probe-level, documented): `get_json_object` strips
   * JSON quoting, so a quoted `"123"` classifies as `int`, and returns SQL
   * NULL for explicit JSON null, so the `null` branch cannot fire (null and
   * missing are indistinguishable here). [[driftTyped]] does NOT use this —
   * it senses from `JsonTopFieldsGenerate`'s quote-preserving type tags;
   * this stays for cheap single-field histograms where the distinction
   * doesn't matter ([[typeHistogram]] / sensing_types).
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
    // parse-once (r17): [[observedType]]'s when-chain references its
    // get_json_object SEVEN times, and conditional branches are excluded
    // from codegen CSE — the old per-field inline form re-parsed the
    // payload up to 7× per field per row (14 get_json_object nodes in the
    // sensing_types plan for 2 fields). One fused JsonPathsGenerate pass
    // extracts every field; the categorize chain then reads cheap staged
    // string columns. Value-identical: the tuple's extraction semantics
    // are spec-pinned to get_json_object (FilterKeepSpec), and a null
    // payload extracts all-null → "missing", same as the old payload.isNull
    // arm.
    import graft.functions.JsonPathOps.jsonPathsTuple
    val names = fields.indices.map(i => s"__st$i")
    // One semantic wrinkle vs the inline form: get_json_object NORMALIZES
    // numbers through Jackson ("1e3" extracts as "1000.0"), while the fused
    // scan returns the raw text — so the float arm additionally accepts an
    // integer mantissa with an exponent, which is exactly the raw set
    // Jackson renders as a double (category-identical; spec-pinned against
    // the inline form including the "1e3" case).
    def typed(raw: Column): Column =
      when(raw.isNull, "missing")
        .when(raw === "null", "null")
        .when(raw.rlike("^-?[0-9]+$"), "int")
        .when(raw.rlike("^-?([0-9]*\\.[0-9]+([eE][+-]?[0-9]+)?|[0-9]+[eE][+-]?[0-9]+)$"),
          "float")
        .when(raw.isin("true", "false"), "bool")
        .when(raw.startsWith("{") || raw.startsWith("["), "object_or_array")
        .otherwise("string")
    val pairs = array(fields.zip(names).map { case (f, n) =>
      struct(lit(f).as("field"), typed(col(n)).as("observed_type"))
    }: _*)
    batch.select(jsonPathsTuple(payload, fields).as(names))
      .select(explode(pairs).as("fo"))
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
   *  - `unexpected_null`    explicit JSON null in a non-nullable column
   *                         (absent keys are null-rate business, not drift
   *                         — reference observe_row)
   *  - `json_structure_change` a JSON-like column's key-set structure
   *                         is not unique across the batch (n = count of
   *                         distinct structures)
   *  - `undeclared_column`  payload key not in the declared schema
   *  - `missing_column`     declared column absent from every row
   *
   * Scale shape (the parse-once cost model of FilterProcessor/
   * OutboxProcessor): ONE `JsonTopFieldsGenerate` parses each payload
   * exactly once, emitting every declared field's value + JSON type tag
   * AND the undeclared key list as Generate-node attributes — pushdown
   * cannot re-expand them into per-column re-parses. The batch is
   * repartitioned before the per-row-expensive parse (a
   * sub-`maxPartitionBytes` parquet file otherwise scans as ONE task —
   * PLANS.md hard-won rule #3). Every declared-column kind is then a
   * codegen'd CONDITIONAL COUNTER in a single global `agg` — no explode,
   * no string group keys, no per-kind subtree (a per-entry explode +
   * groupBy + three union branches measured 75 CPU-s at sf0.1; this shape
   * measures ~7). The one row of counters unpivots to the bounded result
   * set. Undeclared keys are the only dynamic grouping dimension, so they
   * keep their own explode+groupBy branch (second parse of the batch —
   * cheaper than persisting the parsed columns at scale). No driver-side
   * state; all sketch-free exact counts.
   *
   * Reference-faithful per-value semantics (drift_detector.rs:346-412,
   * observe_row): JSON quoting is preserved by the typed scan, so a quoted
   * `"123"` in a strictly-numeric column IS a `type_mismatch` (observed
   * `string`); `unexpected_null` fires only on explicit JSON `null` — an
   * absent key on a non-nullable column feeds null-rate stats, never a
   * drift event.
   */
  /** Observed categories `typeMismatchKind` can emit (its `when` arms). */
  private val mismatchCats = Seq("bool", "int", "float", "string", "object_or_array")

  def driftTyped(batch: DataFrame, payload: Column,
                 declared: Seq[DeclaredColumn],
                 numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else batch.sparkSession.sparkContext.defaultParallelism
    val genNames = declared.indices.flatMap(i => Seq(s"__v$i", s"__t$i")) :+ "__undeclared"
    def parsed = batch.select(payload.as("__p")).repartition(parts)
      .select(graft.functions.JsonPathOps
        .jsonTopFields(col("__p"), declared.map(_.name), collectUndeclared = true)
        .as(genNames))

    // one conditional counter per (declared column × possible drift fact),
    // all evaluated in a single pass over the Generate attributes
    val counters = declared.zipWithIndex.flatMap { case (c, i) =>
      val v = col(s"__v$i")
      val tag = col(s"__t$i")
      val obs = when(tag.isin("object", "array"), lit("object_or_array")).otherwise(tag)
      val mismatch = typeMismatchKind(obs, c.sqlType)
      mismatchCats.map(cat => count(when(mismatch === cat, 1)).as(s"mm_${i}_$cat")) ++
        (if (c.nullable) Nil
         else Seq(count(when(tag === "null", 1)).as(s"nul_$i"))) ++
        (if (c.minValue.isEmpty && c.maxValue.isEmpty) Nil
         else {
           val num = v.cast("double")
           val oor = c.minValue.map(m => num < m).getOrElse(lit(false)) ||
             c.maxValue.map(m => num > m).getOrElse(lit(false))
           Seq(count(when(num.isNotNull && oor, 1)).as(s"oor_$i"))
         }) ++
        (if (!c.isJsonLike) Nil
         else Seq(count_distinct(
           when(tag === "object", to_json(array_sort(json_object_keys(v))))).as(s"ns_$i"))) ++
        Seq(count(when(tag =!= "missing", 1)).as(s"np_$i"))
    } :+ count(lit(1)).as("n_rows")
    val one = parsed.agg(counters.head, counters.tail: _*)

    // unpivot the single counter row into result rows; `keep` carries each
    // kind's emission gate (n>0 / ns>1 / never-present)
    def outRow(name: String, kind: String, expected: String, observed: String,
               n: Column, keep: Column) =
      struct(lit(name).as("column_name"), lit(kind).as("kind"),
        lit(expected).as("expected"), lit(observed).as("observed"),
        n.as("n"), keep.as("keep"))
    val rows = declared.zipWithIndex.flatMap { case (c, i) =>
      mismatchCats.map(cat =>
        outRow(c.name, "type_mismatch", c.sqlType, cat,
          col(s"mm_${i}_$cat"), col(s"mm_${i}_$cat") > 0)) ++
        (if (c.nullable) Nil
         else Seq(outRow(c.name, "unexpected_null", "NOT NULL", "NULL",
           col(s"nul_$i"), col(s"nul_$i") > 0))) ++
        (if (c.minValue.isEmpty && c.maxValue.isEmpty) Nil
         else Seq(outRow(c.name, "value_out_of_range",
           s"[${c.minValue.getOrElse("-inf")},${c.maxValue.getOrElse("inf")}]",
           "out_of_range", col(s"oor_$i"), col(s"oor_$i") > 0))) ++
        (if (!c.isJsonLike) Nil
         else Seq(outRow(c.name, "json_structure_change", "stable structure",
           "n_structures", col(s"ns_$i"), col(s"ns_$i") > 1))) ++
        Seq(outRow(c.name, "missing_column", "declared", "never present",
          col("n_rows"), col(s"np_$i") === 0 && col("n_rows") > 0))
    }
    val declaredOut = one.select(explode(array(rows: _*)).as("r"))
      .filter(col("r.keep"))
      .select(col("r.column_name"), col("r.kind"), col("r.expected"),
        col("r.observed"), col("r.n"))

    // undeclared keys: the one dynamic grouping dimension — its own
    // explode+groupBy branch over a second parse of the batch
    val undeclared = parsed.select(explode(col("__undeclared")).as("column_name"))
      .groupBy("column_name").agg(count(lit(1)).as("n"))
      .select(col("column_name"), lit("undeclared_column").as("kind"),
        lit("(not declared)").as("expected"), lit("present").as("observed"), col("n"))

    declaredOut.unionByName(undeclared)
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
