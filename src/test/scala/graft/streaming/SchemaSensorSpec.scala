package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/**
 * Sensing lifecycle: the reference sensor's six observe states in order
 * (sensor.rs:28-56), the warmup-then-1-in-N sampling policy
 * (deltaforge-config schema_sensing.rs:171-205), the capped structure
 * cache, registry wiring on evolution, and the batch-aggregated stage.
 */
class SchemaSensorSpec extends SparkSpec {
  import SchemaSensor._

  test("one table walks all six lifecycle states in order") {
    val sensor = new SchemaSensor(Config(
      warmupEvents = 4, sampleRate = 3, structureCacheSize = 16, stabilizeAfter = 7))

    // 1. first structure ever → NewSchema, sequence 0
    sensor.observe("t", """{"a":1}""") match {
      case NewSchema(_, 0) => case r => fail(s"expected NewSchema, got $r")
    }
    // 2. new field → Evolved 0→1 (cache invalidated, re-seeded)
    sensor.observe("t", """{"a":1,"b":2}""") match {
      case Evolved(_, _, 0, 1) => case r => fail(s"expected Evolved, got $r")
    }
    // 3. subset payload: cache miss (cleared on evolution) but MERGED schema
    //    unchanged → Unchanged; absence only marks `b` optional (the
    //    documented deviation from per-event fingerprints)
    sensor.observe("t", """{"a":3}""") match {
      case Unchanged(_, 1) => case r => fail(s"expected Unchanged, got $r")
    }
    // 4. structure seen since the evolution → CacheHit, no inference
    sensor.observe("t", """{"a":1,"b":2}""") match {
      case CacheHit(_, 1) => case r => fail(s"expected CacheHit, got $r")
    }
    // 5. past warmup (4 events), event_count=4, 4%3≠0: a NEW structure is
    //    skipped by the sampling gate → Sampled
    sensor.observe("t", """{"a":1,"c":true}""") match {
      case Sampled(_, 1) => case r => fail(s"expected Sampled, got $r")
    }
    // 6. cache hits carry the count to stabilizeAfter → Stabilized
    sensor.observe("t", """{"a":9}""") match {
      case CacheHit(_, 1) => case r => fail(s"expected CacheHit, got $r")
    }
    sensor.observe("t", """{"a":9}""") match {
      case Stabilized(_, 1) => case r => fail(s"expected Stabilized, got $r")
    }
    // stabilized tables early-exit — even an unseen structure senses nothing
    sensor.observe("t", """{"zzz":"q"}""") match {
      case Stabilized(_, 1) => case r => fail(s"expected Stabilized, got $r")
    }
    val st = sensor.state("t").get
    assert(st.eventCount == 8 && st.stabilized)
    assert(st.fields("b").presentIn < st.sensedCount) // optional, not evolved-away

    // disabled sensing is its own terminal state
    assert(new SchemaSensor(Config(enabled = false)).observe("t", "{}") == Disabled)
  }

  test("evolution registers the inferred schema in the registry ledger") {
    val dir = Files.createTempDirectory("sensorReg").toString
    val reg = new SchemaRegistry(spark, s"$dir/ledger")
    val sensor = new SchemaSensor(Config(warmupEvents = 10), registry = Some(reg))
    sensor.observe("orders", """{"id":1,"total":9.5}""")
    sensor.observe("orders", """{"id":2,"total":3.25,"note":"x"}""")
    assert(sensor.evolutions.size == 1)
    val latest = reg.latestSchema("orders").get
    assert(latest.fieldNames.toSet == Set("id", "total", "note"))
    assert(latest("id").dataType == LongType && latest("total").dataType == DoubleType)
    assert(latest("note").nullable) // optional: absent from the first event
    assert(reg.latest("orders").get._1 == 1L) // two versions: 0 then 1
    // at-sequence: version 0 lacks `note` (replay correctness)
    assert(reg.getAtSequence("orders", 0).get.fieldNames.toSet == Set("id", "total"))
  }

  test("batch stage aggregates per structure; sensor sees counts, not rows") {
    import spark.implicits._
    val sensor = new SchemaSensor(Config(warmupEvents = 1000))
    val batch = ((1 to 40).map(i => s"""{"k":$i}""") ++
      (1 to 10).map(i => s"""{"k":$i,"extra":"v"}"""))
      .toDF("after")
      .select(struct(lit("events").as("table")).as("source"), col("after"))
    SchemaSensorStage.processor(sensor)(batch)
    val st = sensor.state("events").get
    assert(st.eventCount == 50)
    assert(st.cacheMisses == 2) // one full inference per distinct structure
    assert(st.cacheHits == 48) // replay equivalence: the rest are hits
    assert(st.fields.keySet == Set("k", "extra"))
    assert(sensor.cacheStatsJson.contains("\"total_cache_hits\":48"))
  }

  test("pipeline wiring: the sensing stage rides CdcPipeline processors") {
    import graft.core.ChangeEvent
    import spark.implicits._
    val sensor = new SchemaSensor(Config(warmupEvents = 1000))
    val sink = new MemorySink("s1")
    val dir = Files.createTempDirectory("sensorPipe").toString
    val cfg = CdcPipeline.Config(
      sinks = Seq(sink), ledgerDir = dir,
      processors = Seq(SchemaSensorStage.processor(sensor)))
    val batch = ChangeEvent.conform(
      (1 to 20).map(i => ("c", s"""{"id":$i}""", i.toLong)).toDF("op", "after", "ts_ms")
        .withColumn("source", struct(lit("db").as("db"), lit("orders").as("table"),
          col("ts_ms").as("sequence")))
        .withColumn("event_id", concat(lit("e"), col("ts_ms")))
        .withColumn("tx_end", lit(true)))
    CdcPipeline.processBatch(cfg, new SinkLedger(dir))(batch, 0L)
    // events flowed to the sink AND the sensor observed the batch
    assert(sink.totalRows == 20)
    val st = sensor.state("orders").get
    assert(st.eventCount == 20 && st.fields.keySet == Set("id"))
  }

  test("structure cache never grows past its cap; at capacity it only checks") {
    val sensor = new SchemaSensor(Config(
      warmupEvents = 2, sampleRate = 1, structureCacheSize = 3, stabilizeAfter = 0))
    (0 until 10).foreach(i => sensor.observe("t", s"""{"f$i":1}"""))
    val st = sensor.state("t").get
    assert(st.structures.size <= 3)
    assert(st.cacheMisses == 10) // every new structure missed
  }

  // r17: typeHistogram's parse-once staged form must classify exactly like
  // the old per-field inline observedType (whose when-chain re-parsed the
  // payload up to 7× per field — conditional branches are outside codegen
  // CSE). One row per category: int, float, bool, object, array, string,
  // explicit JSON null (indistinguishable from missing via the
  // get_json_object semantics both forms share), missing field, null payload.
  test("typeHistogram staged parse classifies identically to inline observedType") {
    import spark.implicits._
    val payloads = Seq(
      """{"a": 42, "b": "x"}""",
      """{"a": -3.5, "b": 7}""",
      """{"a": true, "b": {"n": 1}}""",
      """{"a": [1,2], "b": 1e3}""",
      """{"a": "str", "b": null}""",
      """{"b": 0}""",
      null: String)
    val df = payloads.toDF("p")
    val got = SchemaSensing.typeHistogram(df, col("p"), Seq("a", "b"))
      .orderBy("field", "observed_type").collect().toSeq
    // the old inline form, reconstructed verbatim
    val pairs = array(Seq("a", "b").map { f =>
      struct(lit(f).as("field"),
        SchemaSensing.observedType(col("p"), f).as("observed_type"))
    }: _*)
    val want = df.select(explode(pairs).as("fo"))
      .groupBy(col("fo.field").as("field"), col("fo.observed_type").as("observed_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("field", "observed_type").collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }
}
