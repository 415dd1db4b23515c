package graft.operators

import graft.SparkSpec
import graft.core.ChangeEvent
import org.apache.spark.sql.functions._

/** Outbox reshape (FIXTURES §C3, outbox.rs) and envelope wire shapes (§D). */
class OutboxEnvelopeSpec extends SparkSpec {

  private def outboxEvent(op: String = "c", after: String =
      """{"id": "evt-abc-123", "aggregate_type": "Order", "aggregate_id": "42",
        | "event_type": "OrderCreated", "trace_id": "abc-123",
        | "payload": {"order_id": 42, "total": 99.99}}""".stripMargin) = {
    import spark.implicits._
    ChangeEvent.conform(
      Seq((op, after)).toDF("op", "after")
        .withColumn("source", struct(lit("db1").as("db"), lit("__outbox").as("schema"),
          lit("outbox").as("table"), lit("mysql").as("connector")))
        .withColumn("event_id", lit("e-1")))
  }

  test("outbox: topic template, key=aggregate_id, payload promoted, df-* headers") {
    val out = OutboxProcessor(OutboxProcessor.Config(
      topicTemplate = Some("${aggregate_type}.${event_type}")))(outboxEvent())
    val row = out.select(col("routing.topic"), col("routing.key"), col("after"),
      col("routing.headers")).head()
    assert(row.getString(0) == "Order.OrderCreated")
    assert(row.getString(1) == "42")
    assert(row.getString(2).contains("\"order_id\":42"))
    val headers = row.getMap[String, String](3)
    assert(headers("df-aggregate-type") == "Order")
    assert(headers("df-event-id") == "evt-abc-123")
    assert(headers("df-source-kind") == "mysql")
  }

  test("outbox: absent fields emit NO header, not a null-valued one (outbox.rs if-let)") {
    // no "id" field and no event_type → df-event-id falls back to event_id,
    // df-event-type must be ABSENT from the map entirely
    val out = OutboxProcessor(OutboxProcessor.Config())(outboxEvent(after =
      """{"aggregate_type": "Order", "aggregate_id": "42", "payload": {"x": 1}}"""))
    val headers = out.select(col("routing.headers")).head().getMap[String, String](0)
    assert(headers("df-event-id") == "e-1") // envelope fallback
    assert(!headers.contains("df-event-type"))
    assert(headers.contains("df-aggregate-type"))
  }

  test("outbox: empty-resolving templates fall THROUGH the cascade (outbox.rs:267-290)") {
    // topic template of pure missing refs resolves "" → topic column → default;
    // key template likewise falls back to aggregate_id
    val withTopicCol = outboxEvent(after =
      """{"aggregate_type": "Order", "aggregate_id": "42", "event_type": "E",
        | "payload": {}, "topic": "col-topic"}""".stripMargin)
    val r1 = OutboxProcessor(OutboxProcessor.Config(
      topicTemplate = Some("${missing_field}"),
      keyTemplate = Some("${also_missing}")))(withTopicCol)
      .select(col("routing.topic"), col("routing.key")).head()
    assert(r1.getString(0) == "col-topic")
    assert(r1.getString(1) == "42") // key fell back to aggregate_id
    val noTopic = outboxEvent(after =
      """{"aggregate_type": "Order", "aggregate_id": "42", "event_type": "E", "payload": {}}""")
    val r2 = OutboxProcessor(OutboxProcessor.Config(
      topicTemplate = Some("${missing_field}"), defaultTopic = "fallback"))(noTopic)
      .select(col("routing.topic")).head()
    assert(r2.getString(0) == "fallback")
    // a PARTIALLY-resolving template is non-empty and wins (lenient "")
    val r3 = OutboxProcessor(OutboxProcessor.Config(
      topicTemplate = Some("${aggregate_type}.${missing}")))(noTopic)
      .select(col("routing.topic")).head()
    assert(r3.getString(0) == "Order.")
  }

  test("outbox: non-insert dropped; non-outbox passthrough") {
    val upd = OutboxProcessor(OutboxProcessor.Config())(outboxEvent(op = "u"))
    assert(upd.count() == 0)
    import spark.implicits._
    val normal = ChangeEvent.conform(
      Seq(("c", """{"a":1}""")).toDF("op", "after")
        .withColumn("source", struct(lit("db1").as("db"), lit("t").as("table"))))
    val out = OutboxProcessor(OutboxProcessor.Config())(normal)
    assert(out.count() == 1)
    assert(out.select("after").head().getString(0) == """{"a":1}""")
  }

  test("outbox: topic cascade falls back to topic column then default (outbox.rs:267-290)") {
    val withTopicCol = outboxEvent(after =
      """{"id":"e","aggregate_type":"T","aggregate_id":"1","event_type":"E",
        |"topic":"explicit-topic","payload":{}}""".stripMargin)
    val out1 = OutboxProcessor(OutboxProcessor.Config())(withTopicCol)
    assert(out1.select("routing.topic").head().getString(0) == "explicit-topic")
    val noTopic = outboxEvent(after =
      """{"id":"e","aggregate_type":"T","aggregate_id":"1","event_type":"E","payload":{}}""")
    val out2 = OutboxProcessor(OutboxProcessor.Config(defaultTopic = "fallback"))(noTopic)
    assert(out2.select("routing.topic").head().getString(0) == "fallback")
  }

  test("outbox strict mode: missing required fields dropped + reported") {
    val bad = outboxEvent(after = """{"id":"e","aggregate_type":"T","payload":{}}""")
    val cfg = OutboxProcessor.Config(strict = true)
    assert(OutboxProcessor(cfg)(bad).count() == 0)
    val viol = OutboxProcessor.strictViolations(cfg)(bad)
    val missing = viol.select("missing_fields").head().getString(0)
    assert(missing.contains("aggregate_id") && missing.contains("event_type"))
  }

  private def plainEvent = {
    import spark.implicits._
    ChangeEvent.conform(
      Seq(("u", """{"id":1}""", """{"id":0}""", 1700000000123L)).toDF("op", "after", "before", "ts_ms")
        .withColumn("source", struct(lit("mysql").as("connector"), lit("prod").as("name"),
          lit("db1").as("db"), lit("t1").as("table")))
        .withColumn("event_id", lit("e-1")))
  }

  test("debezium envelope wraps payload with null schema (debezium.rs:27-52)") {
    val v = plainEvent.select(Envelopes.debezium.as("v")).head().getString(0)
    assert(v.startsWith("""{"schema":null,"payload":{"""))
    assert(v.contains(""""op":"u""""))
  }

  test("cloudevents 1.0: type verb mapping, RFC3339 time, subject (cloudevents.rs:42-110)") {
    val v = plainEvent.select(Envelopes.cloudEvents("acme.ev").as("v")).head().getString(0)
    assert(v.contains(""""specversion":"1.0""""))
    assert(v.contains(""""type":"acme.ev.updated""""))
    assert(v.contains(""""time":"2023-11-14T22:13:20.123Z""""))
    assert(v.contains(""""subject":"db1.t1""""))
    assert(v.contains(""""id":"e-1""""))
    // data carries before/after/op
    assert(v.contains(""""op":"u""""))
  }

  test("idempotency key is stable and per-(position, table, op)") {
    val k1 = plainEvent.select(ChangeEvent.idempotencyKey.as("k")).head().getString(0)
    val k2 = plainEvent.select(ChangeEvent.idempotencyKey.as("k")).head().getString(0)
    assert(k1 == k2 && k1.length == 64)
    val other = plainEvent.withColumn("op", lit("d"))
    assert(other.select(ChangeEvent.idempotencyKey.as("k")).head().getString(0) != k1)
  }
}
