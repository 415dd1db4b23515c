package graft.streaming

import graft.SparkSpec
import graft.core.ChangeEvent
import graft.streaming.ClickHouseWire._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.nio.file.Files

/**
 * ClickHouse RowBinary wire format + HTTP insert path.
 *
 * Byte pins mirror the reference's own unit vectors
 * (crates/sinks/src/clickhouse/rowbinary.rs:184-252, project.rs:127-156,
 * version.rs:42-48) so the Scala encoder is provably wire-compatible.
 */
class ClickHouseWireSpec extends SparkSpec {

  private def enc(dt: DataType, nullable: Boolean, v: Any): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    RowBinary.encodeValue(out, dt, nullable, v)
    out.toByteArray
  }

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray

  test("rowbinary: reference byte vectors") {
    assert(enc(LongType, nullable = false, 1L).sameElements(le(1L, 8)))
    assert(enc(StringType, nullable = false, "hi").sameElements(Array[Byte](2, 'h', 'i')))
    assert(enc(LongType, nullable = true, null).sameElements(Array[Byte](1)))
    assert(enc(LongType, nullable = true, 5L).sameElements(Array[Byte](0) ++ le(5L, 8)))
    intercept[IllegalArgumentException] { enc(LongType, nullable = false, null) }
    // Decimal(12,2) "12.34" → unscaled 1234 as Int64 LE (rowbinary.rs:228-238)
    assert(enc(DecimalType(12, 2), nullable = false, new java.math.BigDecimal("12.34"))
      .sameElements(le(1234L, 8)))
    // negative + short frac: -1.2 @ scale 3 → -1200 ; 5 @ scale 2 → 500
    assert(enc(DecimalType(12, 3), nullable = false, new java.math.BigDecimal("-1.2"))
      .sameElements(le(-1200L, 8)))
    assert(enc(DecimalType(5, 2), nullable = false, new java.math.BigDecimal("5"))
      .sameElements(le(500L, 4))) // P≤9 → Int32
    // varuint multibyte: 300 → [0xAC, 0x02]
    val out = new ByteArrayOutputStream()
    RowBinary.writeVarUInt(out, 300L)
    assert(out.toByteArray.sameElements(Array(0xAC.toByte, 0x02.toByte)))
    assert(RowBinary.readVarUInt(out.toByteArray, 0)._1 == 300L)
  }

  test("rowbinary: codec round-trips every supported type incl. nulls") {
    val schema = StructType(Seq(
      StructField("b", BooleanType, nullable = false),
      StructField("i16", ShortType, nullable = false),
      StructField("i32", IntegerType, nullable = false),
      StructField("i64", LongType, nullable = false),
      StructField("f64", DoubleType, nullable = false),
      StructField("s", StringType, nullable = true),
      StructField("d", DecimalType(20, 4), nullable = true), // P>18 → Int128
      StructField("n", LongType, nullable = true)))
    val rows = Seq(
      Seq[Any](true, 7.toShort, -42, 1234567890123L, 3.5, "héllo",
        new java.math.BigDecimal("-98765.4321"), null),
      Seq[Any](false, (-1).toShort, 0, -1L, -0.25, null,
        new java.math.BigDecimal("0.0001"), 99L))
    val out = new ByteArrayOutputStream()
    rows.foreach { vs =>
      schema.fields.zip(vs).foreach { case (f, v) => RowBinary.encodeValue(out, f.dataType, f.nullable, v) }
    }
    val decoded = RowBinary.decode(out.toByteArray, schema)
    assert(decoded.size == 2)
    rows.zip(decoded).foreach { case (want, got) =>
      want.zip(got).foreach {
        case (w: java.math.BigDecimal, g: java.math.BigDecimal) => assert(w.compareTo(g) == 0)
        case (w, g) => assert(w == g)
      }
    }
  }

  test("version: LSN parses to a monotonic u64, malformed falls back") {
    import spark.implicits._
    val df = Seq("16/B374D848", "16/B374D849", "17/0", "not-an-lsn", null)
      .toDF("lsn").select(lsnToLong(col("lsn")).as("v"))
    val vs = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(vs(0).contains((0x16L << 32) | 0xB374D848L))
    assert(vs(1).get > vs(0).get && vs(2).get > vs(1).get)
    assert(vs(3).isEmpty && vs(4).isEmpty)
  }

  private def eventsDf(rows: Seq[(String, String, String, Long)]): DataFrame = {
    import spark.implicits._
    ChangeEvent.conform(
      rows.toDF("op", "before", "after", "ts_ms")
        .withColumn("source", struct(lit("db").as("db"), lit("orders").as("table")))
        .withColumn("event_id", concat(lit("e"), monotonically_increasing_id())))
  }

  test("un-encodable column types fail at CONSTRUCTION, not per-row") {
    val bad = StructType(Seq(StructField("tags", ArrayType(StringType))))
    val e = intercept[IllegalArgumentException] {
      new ClickHouseSink("chbad", "p", () => sys.error("unused"),
        "db", "t", bad, Seq("tags"))
    }
    assert(e.getMessage.contains("no RowBinary encoding"))
    assert(!RowBinary.encodes(MapType(StringType, StringType)))
    assert(RowBinary.encodes(DecimalType(10, 2)) && RowBinary.encodes(TimestampType))
  }

  test("failed CREATE TABLE is retried on the next batch (no latched false success)") {
    // counters live in the companion object: the transport closure is
    // serialized to executors, so instance fields would mutate a copy
    ClickHouseWireSpec.ddls.set(0); ClickHouseWireSpec.inserts.set(0)
    val transport = new ChTransport {
      override def executeDdl(sql: String): Unit =
        if (ClickHouseWireSpec.ddls.incrementAndGet() == 1)
          throw new RuntimeException("ch unavailable")
      override def insertRowBinary(table: String, token: String, body: Array[Byte]): Unit =
        ClickHouseWireSpec.inserts.incrementAndGet(): Unit
    }
    val schema = StructType(Seq(StructField("id", LongType, nullable = false)))
    val sink = new ClickHouseSink("chddl", "p", () => transport, "db", "t", schema, Seq("id"))
    val batch = eventsDf(Seq(("c", null, """{"id":1}""", 1L))).coalesce(1)
    intercept[RuntimeException] { sink.write(batch, 0L) } // DDL down → batch fails
    assert(ClickHouseWireSpec.inserts.get() == 0) // nothing inserted against a missing table
    sink.write(batch, 0L) // replay: DDL retried and succeeds this time
    assert(ClickHouseWireSpec.ddls.get() == 2 && ClickHouseWireSpec.inserts.get() == 1)
  }

  test("projection: insert uses after-image + meta; delete uses before + _deleted") {
    val userSchema = StructType(Seq(StructField("id", LongType, nullable = false)))
    val batch = eventsDf(Seq(
      ("c", null, """{"id":7}""", 5L),
      ("d", """{"id":9}""", null, 5L)))
    val projected = projectEvents(batch, userSchema, TsMs)
      .orderBy("_deleted") // insert first, delete second
    val out = new ByteArrayOutputStream()
    val ws = wireSchema(userSchema)
    projected.collect().foreach(r => RowBinary.encodeRow(out, ws, r))
    val bytes = out.toByteArray
    // reference project.rs:128-142 vector: id LE, "c", version=ts_ms u64, 0, ts i64
    val insertWant = le(7L, 8) ++ Array[Byte](1, 'c') ++ le(5L, 8) ++ Array[Byte](0) ++ le(5L, 8)
    assert(bytes.take(insertWant.length).sameElements(insertWant))
    // delete row: key from the BEFORE image, _deleted = 1 (project.rs:145-156)
    val del = bytes.drop(insertWant.length)
    assert(del.take(8).sameElements(le(9L, 8)))
    assert(del(8) == 1 && del(9) == 'd')
    assert(del(18) == 1) // _deleted after id(8) + _op(2) + _version(8)
  }

  test("sink e2e vs local HTTP stub: DDL once, dedup token, DLQ isolation, replay-stable") {
    val calls = new java.util.concurrent.ConcurrentLinkedQueue[(String, Array[Byte])]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
        calls.add((q, ex.getRequestBody.readAllBytes()))
        ex.sendResponseHeaders(200, -1); ex.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val userSchema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("name", StringType, nullable = true)))
      val dlqDir = Files.createTempDirectory("graft-ch-dlq").toString
      val sink = new ClickHouseSink("ch1", "p1",
        () => new ClickHouseHttpClient(url, "analytics", user = Some("default")),
        "analytics", "orders", userSchema, Seq("id"),
        dlq = Some(Dlq.Config("p1", "ch1", s"$dlqDir/journal")))
      val batch = eventsDf(Seq(
        ("c", null, """{"id":1,"name":"a"}""", 10L),
        ("u", null, """{"id":2,"name":null}""", 11L),
        ("d", """{"id":3,"name":"c"}""", null, 12L),
        ("c", null, """{"name":"no-id"}""", 13L))) // id missing → DLQ
        .coalesce(1)
      sink.write(batch, 7L)

      val all = calls.toArray(Array.empty[(String, Array[Byte])])
      val ddls = all.filter(_._1.isEmpty)
      val inserts = all.filterNot(_._1.isEmpty)
      assert(ddls.length == 1, "auto-created the table exactly once")
      val ddlSql = new String(ddls.head._2)
      assert(ddlSql.contains("CREATE TABLE IF NOT EXISTS `analytics`.`orders`"))
      assert(ddlSql.contains("ReplacingMergeTree(_version, _deleted)"))
      assert(inserts.length == 1)
      val (q, body) = inserts.head
      assert(q.contains("INSERT+INTO+analytics.orders+FORMAT+RowBinary")
        || q.contains("INSERT%20INTO%20analytics.orders%20FORMAT%20RowBinary"))
      assert(q.contains("insert_deduplication_token=p1:ch1:7:0:3")) // getQuery %-decodes
      val rows = RowBinary.decode(body, wireSchema(userSchema))
      assert(rows.length == 3, "bad row isolated, good rows inserted")
      assert(rows.map(_.head) == Seq(1L, 2L, 3L))
      assert(rows(1)(1) == null) // nullable name null survives
      assert(rows(2)(4) == true) // delete row flagged _deleted (id,name,_op,_version,_deleted,…)
      // bad row landed in the DLQ journal with the serialization kind
      val journal = spark.read.parquet(s"$dlqDir/journal")
      assert(journal.count() == 1)
      assert(journal.select("meta.error_kind").head().getString(0) == "Serialization")
      assert(journal.select("event").head().getString(0).contains("no-id"))

      // replay of the same micro-batch re-sends the SAME dedup token
      sink.write(batch, 7L)
      val replays = calls.toArray(Array.empty[(String, Array[Byte])]).filterNot(_._1.isEmpty)
      assert(replays.length == 2)
      assert(replays.map(_._1).distinct.length == 1, "identical token + query on replay")
      assert(replays(0)._2.sameElements(replays(1)._2), "byte-identical body on replay")
    } finally server.stop(0)
  }

  test("http client: auth headers paired, DDL as body without query param") {
    val headers = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        headers.add((
          Option(ex.getRequestHeaders.getFirst("X-ClickHouse-User")).orNull,
          Option(ex.getRequestHeaders.getFirst("X-ClickHouse-Key")).orNull,
          Option(ex.getRequestURI.getQuery).getOrElse("")))
        ex.sendResponseHeaders(200, -1); ex.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      // no-password user still sends an EMPTY key (client.rs:80-87)
      val c = new ClickHouseHttpClient(url, "d", user = Some("u"), password = None)
      c.executeDdl("CREATE TABLE x (i Int64) ENGINE = MergeTree ORDER BY i")
      c.insertRowBinary("t", "tok", Array[Byte](1))
      val hs = headers.toArray(Array.empty[(String, String, String)])
      assert(hs(0) == (("u", "", "")))
      assert(hs(1)._1 == "u" && hs(1)._2 == "" && hs(1)._3.contains("insert_deduplication_token=tok"))
      // 403 → auth exception (fatal, not retryable)
      server.removeContext("/")
      server.createContext("/", new HttpHandler {
        def handle(ex: HttpExchange): Unit = { ex.sendResponseHeaders(403, -1); ex.close() }
      })
      intercept[ChAuthException] { c.executeDdl("SELECT 1") }
    } finally server.stop(0)
  }
}

object ClickHouseWireSpec {
  val ddls = new java.util.concurrent.atomic.AtomicInteger(0)
  val inserts = new java.util.concurrent.atomic.AtomicInteger(0)
}
