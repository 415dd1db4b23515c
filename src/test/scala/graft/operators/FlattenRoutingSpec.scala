package graft.operators

import graft.SparkSpec
import graft.core.ChangeEvent
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Flatten policies (FIXTURES §C2, flatten.rs) + routing templates (§C4, routing.rs). */
class FlattenRoutingSpec extends SparkSpec {

  private lazy val nestedDf = {
    import spark.implicits._
    val json =
      """{"user": {"address": {"city": "x", "geo": {"lat": 1.0}}, "tags": ["a","b"]},
        | "n": 5}""".stripMargin
    val schema = StructType(Seq(
      StructField("user", StructType(Seq(
        StructField("address", StructType(Seq(
          StructField("city", StringType),
          StructField("geo", StructType(Seq(StructField("lat", DoubleType))))))),
        StructField("tags", ArrayType(StringType))))),
      StructField("n", IntegerType)))
    Seq(json).toDF("payload")
      .withColumn("payload", from_json(col("payload"), schema))
  }

  test("default flatten: full depth, separator __, lists preserved") {
    val out = FlattenProcessor(nestedDf, "payload")
    assert(out.columns.toSet ==
      Set("user__address__city", "user__address__geo__lat", "user__tags", "n"))
    val row = out.head()
    assert(row.getAs[String]("user__address__city") == "x")
    assert(row.getAs[Double]("user__address__geo__lat") == 1.0)
  }

  test("max_depth keeps deeper values as opaque leaves (flatten.rs:8-18)") {
    val out = FlattenProcessor(nestedDf, "payload", FlattenProcessor.Config(maxDepth = 2))
    assert(out.columns.contains("user__address")) // still a struct leaf
    assert(!out.columns.contains("user__address__city"))
  }

  test("list policy index expands to __0/__1 (flatten_cfg list index)") {
    val out = FlattenProcessor(nestedDf, "payload",
      FlattenProcessor.Config(listPolicy = FlattenProcessor.ListIndex(2)))
    assert(out.columns.contains("user__tags__0"))
    val row = out.head()
    assert(row.getAs[String]("user__tags__0") == "a")
    assert(row.getAs[String]("user__tags__1") == "b")
  }

  test("collision policies last/first/error (flatten.rs:162-183)") {
    import spark.implicits._
    // a__b arises both from column "a__b" flattened at root and nested a.b
    val df = Seq((1, 2)).toDF("x", "y")
      .select(struct(struct(col("x").as("b")).as("a"),
        col("y").as("a__b")).as("payload"))
    val last = FlattenProcessor(df, "payload",
      FlattenProcessor.Config(collisionPolicy = FlattenProcessor.CollisionLast))
    assert(last.select("a__b").head().getInt(0) == 2)
    val first = FlattenProcessor(df, "payload",
      FlattenProcessor.Config(collisionPolicy = FlattenProcessor.CollisionFirst))
    assert(first.select("a__b").head().getInt(0) == 1)
    intercept[IllegalArgumentException] {
      FlattenProcessor(df, "payload",
        FlattenProcessor.Config(collisionPolicy = FlattenProcessor.CollisionError))
    }
  }

  private def evDf = {
    import spark.implicits._
    ChangeEvent.conform(
      Seq(("c", """{"customer_id": "c-9", "x": 1}""", "t1"))
        .toDF("op", "after", "tenant_id")
        .withColumn("source", struct(lit("db1").as("db"), lit("orders").as("table")))
        .withColumn("routing", struct(lit("").as("topic"), lit(null).cast(StringType).as("key"),
          lit(null).cast(MapType(StringType, StringType)).as("headers"), lit(false).as("raw_payload"))))
  }

  test("routing templates resolve envelope paths and payload paths (routing.rs:94-236)") {
    def run(tpl: String): String =
      evDf.select(Routing.template(tpl).as("v")).head().getString(0)
    assert(run("cdc.${source.table}") == "cdc.orders")
    assert(run("${tenant_id}.${source.table}") == "t1.orders")
    assert(run("${after.customer_id}") == "c-9")
    assert(run("static-topic") == "static-topic")
  }

  test("strict template: unresolvable events route to the DLQ, resolvable deliver (routing.rs strict)") {
    import spark.implicits._
    import graft.streaming.Dlq
    val events = ChangeEvent.conform(
      Seq(("c", """{"kind": "order", "id": 1}""", "e-ok"),
        ("c", """{"id": 2}""", "e-bad")) // no `kind` → strict template → NULL
        .toDF("op", "after", "event_id")
        .withColumn("source", struct(lit("db1").as("db"), lit("t").as("table"))))
    val routed = events.withColumn("topic",
      Routing.template("cdc.${after.kind}", strict = true))
    val dir = java.nio.file.Files.createTempDirectory("strict-dlq").toString
    val cfg = Dlq.Config("pipe", "sink", s"$dir/dlq")
    val good = Dlq.splitAndJournal(cfg, routed, col("topic").isNotNull,
      "routing", lit("strict template unresolvable"))
    assert(good.select("event_id").as[String].collect().toSeq == Seq("e-ok"))
    assert(good.head().getAs[String]("topic") == "cdc.order")
    val journal = spark.read.parquet(s"$dir/dlq")
    assert(journal.count() == 1)
    assert(journal.head().getAs[String]("event_id") == "e-bad")
    // lenient mode keeps both, substituting ""
    assert(events.withColumn("t", Routing.template("cdc.${after.kind}"))
      .filter(col("t") === "cdc.").count() == 1)
  }

  test("template parse errors: unclosed, empty, >3 segments") {
    intercept[IllegalArgumentException](Routing.template("x${source.table"))
    intercept[IllegalArgumentException](Routing.template("x${}"))
    intercept[IllegalArgumentException](Routing.template("${a.b.c.d}"))
  }

  test("resolution order: event override beats template beats static; empty string = no override") {
    // empty-string topic override present → falls through to template
    val r1 = evDf.select(Routing.resolveTopic(Some("cdc.${source.table}"), "st").as("v"))
      .head().getString(0)
    assert(r1 == "cdc.orders")
    val withOverride = evDf.withColumn("routing",
      col("routing").withField("topic", lit("override.t")))
    val r2 = withOverride.select(Routing.resolveTopic(Some("cdc.${source.table}"), "st").as("v"))
      .head().getString(0)
    assert(r2 == "override.t")
    val r3 = evDf.select(Routing.resolveTopic(None, "st").as("v")).head().getString(0)
    assert(r3 == "st")
  }
}
