package graft.streaming

import graft.core.ChangeEvent
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import java.math.BigInteger
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

/**
 * ClickHouse RowBinary wire format + HTTP insert path.
 *
 * Reference: crates/sinks/src/clickhouse/rowbinary.rs (encode rules),
 * client.rs (HTTP `INSERT … FORMAT RowBinary` with
 * `insert_deduplication_token`, DDL as POST body, paired
 * X-ClickHouse-User/Key headers), project.rs:35-67 (row layout: user
 * columns then `_op`/`_version`/`_deleted`/`_source_ts` meta),
 * version.rs:12-36 (LSN → monotonic u64), sink.rs:119-174 (per-row encode
 * failures isolated to the DLQ, one insert per batch with a dedup token).
 *
 * RowBinary rules (rowbinary.rs:1-10):
 *  - fixed integers little-endian
 *  - String: LEB128 var-uint length prefix + UTF-8 bytes
 *  - Nullable(T): 1 byte (1 = null, 0 = present), then the value if present
 *  - Decimal(P,S): the unscaled integer, LE, sized by P (≤9 → Int32,
 *    ≤18 → Int64, else Int128)
 *  - DateTime64(3): Int64 milliseconds since epoch
 *  - Bool/UInt8: 1 byte
 *
 * Spark-first division of labor: the projection from the JSON change-event
 * image to typed columns is DECLARATIVE (`from_json` + meta-column
 * expressions — codegen'd, pushdown-friendly), and per-row DLQ eligibility
 * is a declarative predicate (a non-nullable column that comes back null
 * cannot encode — exactly the reference's per-row `EncodeError`). Only the
 * final byte encode + HTTP POST run imperatively, per partition.
 */
object ClickHouseWire {

  // ————————————————————————— RowBinary codec —————————————————————————

  object RowBinary {

    /** LEB128 var-uint (ClickHouse string-length prefix), rowbinary.rs:39. */
    def writeVarUInt(out: ByteArrayOutputStream, value: Long): Unit = {
      var n = value
      var done = false
      while (!done) {
        var b = (n & 0x7f).toInt
        n = n >>> 7
        if (n != 0) b |= 0x80
        out.write(b)
        done = n == 0
      }
    }

    def readVarUInt(buf: Array[Byte], pos: Int): (Long, Int) = {
      var n = 0L
      var shift = 0
      var p = pos
      var done = false
      while (!done) {
        val b = buf(p) & 0xff
        n |= (b & 0x7f).toLong << shift
        shift += 7
        p += 1
        done = (b & 0x80) == 0
      }
      (n, p)
    }

    private def writeLE(out: ByteArrayOutputStream, v: Long, bytes: Int): Unit = {
      var i = 0
      while (i < bytes) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }

    private def readLE(buf: Array[Byte], pos: Int, bytes: Int): Long = {
      var v = 0L
      var i = 0
      while (i < bytes) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      v
    }

    /** Sign-extend an LE read of `bytes` width into a Long. */
    private def readLESigned(buf: Array[Byte], pos: Int, bytes: Int): Long = {
      val raw = readLE(buf, pos, bytes)
      val shift = 64 - 8 * bytes
      (raw << shift) >> shift
    }

    /** Two's-complement little-endian of `bi`, fixed width `n` bytes. */
    private def bigIntLE(bi: BigInteger, n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var x = bi
      var i = 0
      while (i < n) { out(i) = x.byteValue(); x = x.shiftRight(8); i += 1 }
      out
    }

    private def bigIntFromLE(buf: Array[Byte], pos: Int, n: Int): BigInteger = {
      val be = new Array[Byte](n)
      var i = 0
      while (i < n) { be(i) = buf(pos + n - 1 - i); i += 1 }
      new BigInteger(be)
    }

    /** Decimal physical width from precision (rowbinary.rs:151-157). */
    def decimalBytes(precision: Int): Int =
      if (precision <= 9) 4 else if (precision <= 18) 8 else 16

    /**
     * Encode one value of Spark type `dt` (after the declarative projection)
     * into RowBinary. `nullable` follows the TARGET column, not the Spark
     * field. Throws IllegalArgumentException on a null in a non-null column
     * (caller isolates the row into the DLQ, sink.rs:138-144) — but the
     * declarative split should have caught those already.
     */
    /** Types [[encodeValue]] can put on the wire (constructor-time guard). */
    def encodes(dt: DataType): Boolean = dt match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | StringType | BinaryType |
           TimestampType | TimestampNTZType | DateType => true
      case _: DecimalType => true
      case _ => false
    }

    def encodeValue(out: ByteArrayOutputStream, dt: DataType, nullable: Boolean, v: Any): Unit = {
      if (nullable) {
        if (v == null) { out.write(1); return }
        out.write(0)
      } else if (v == null) {
        throw new IllegalArgumentException(s"null in non-null ${dt.simpleString} column")
      }
      dt match {
        case BooleanType => out.write(if (v.asInstanceOf[Boolean]) 1 else 0)
        case ByteType => out.write(v.asInstanceOf[Byte].toInt)
        case ShortType => writeLE(out, v.asInstanceOf[Short].toLong, 2)
        case IntegerType => writeLE(out, v.asInstanceOf[Int].toLong, 4)
        case LongType => writeLE(out, v.asInstanceOf[Long], 8)
        case FloatType =>
          writeLE(out, java.lang.Float.floatToIntBits(v.asInstanceOf[Float]).toLong, 4)
        case DoubleType =>
          writeLE(out, java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), 8)
        case StringType =>
          val bytes = v.toString.getBytes(UTF_8)
          writeVarUInt(out, bytes.length.toLong)
          out.write(bytes, 0, bytes.length)
        case BinaryType =>
          val bytes = v.asInstanceOf[Array[Byte]]
          writeVarUInt(out, bytes.length.toLong)
          out.write(bytes, 0, bytes.length)
        case d: DecimalType =>
          val unscaled = v.asInstanceOf[java.math.BigDecimal]
            .setScale(d.scale, java.math.RoundingMode.DOWN).unscaledValue()
          out.write(bigIntLE(unscaled, decimalBytes(d.precision)), 0, decimalBytes(d.precision))
        case TimestampType | TimestampNTZType =>
          // DateTime64(3) = Int64 epoch millis (rowbinary.rs:91-93)
          val millis = v match {
            case ts: java.sql.Timestamp => ts.getTime
            case i: java.time.Instant => i.toEpochMilli
            case l: java.lang.Long => l.longValue()
            case ldt: java.time.LocalDateTime =>
              ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
          }
          writeLE(out, millis, 8)
        case DateType =>
          // Date32 = Int32 days since epoch
          val days = v match {
            case d: java.sql.Date => d.toLocalDate.toEpochDay
            case d: java.time.LocalDate => d.toEpochDay
            case i: java.lang.Integer => i.longValue()
          }
          writeLE(out, days, 4)
        case other =>
          throw new IllegalArgumentException(s"no RowBinary encoding for ${other.simpleString}")
      }
    }

    /** Encode one projected row in schema order (target nullability = Spark field nullability). */
    def encodeRow(out: ByteArrayOutputStream, schema: StructType, row: Row): Unit = {
      var i = 0
      while (i < schema.length) {
        val f = schema(i)
        encodeValue(out, f.dataType, f.nullable, if (row.isNullAt(i)) null else row.get(i))
        i += 1
      }
    }

    /**
     * Decode RowBinary rows back into Scala values (test/verification path —
     * proves encode correctness without a live ClickHouse).
     */
    def decode(buf: Array[Byte], schema: StructType): Seq[Seq[Any]] = {
      val rows = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
      var p = 0
      while (p < buf.length) {
        val row = schema.fields.map { f =>
          if (f.nullable) {
            val marker = buf(p); p += 1
            if (marker == 1) null
            else { val (v, np) = decodeOne(buf, p, f.dataType); p = np; v }
          } else { val (v, np) = decodeOne(buf, p, f.dataType); p = np; v }
        }
        rows += row.toSeq
      }
      rows.toSeq
    }

    private def decodeOne(buf: Array[Byte], pos: Int, dt: DataType): (Any, Int) = dt match {
      case BooleanType => (buf(pos) == 1, pos + 1)
      case ByteType => (buf(pos), pos + 1)
      case ShortType => (readLESigned(buf, pos, 2).toShort, pos + 2)
      case IntegerType => (readLESigned(buf, pos, 4).toInt, pos + 4)
      case LongType => (readLE(buf, pos, 8), pos + 8)
      case FloatType => (java.lang.Float.intBitsToFloat(readLE(buf, pos, 4).toInt), pos + 4)
      case DoubleType => (java.lang.Double.longBitsToDouble(readLE(buf, pos, 8)), pos + 8)
      case StringType =>
        val (len, p) = readVarUInt(buf, pos)
        (new String(buf, p, len.toInt, UTF_8), p + len.toInt)
      case BinaryType =>
        val (len, p) = readVarUInt(buf, pos)
        (java.util.Arrays.copyOfRange(buf, p, p + len.toInt), p + len.toInt)
      case d: DecimalType =>
        val n = decimalBytes(d.precision)
        (new java.math.BigDecimal(bigIntFromLE(buf, pos, n), d.scale), pos + n)
      case TimestampType | TimestampNTZType => (readLE(buf, pos, 8), pos + 8) // epoch millis
      case DateType => (readLESigned(buf, pos, 4).toInt, pos + 4) // epoch days
      case other => throw new IllegalArgumentException(s"no RowBinary decoding for ${other.simpleString}")
    }
  }

  // ————————————————————————— HTTP transport —————————————————————————

  /**
   * The transport the sink drives — a trait so specs inject a capturing
   * stand-in and the live client is exercised against a local HTTP stub
   * (reference client.rs:11-22 `ChTransport`).
   */
  trait ChTransport extends Serializable {
    def insertRowBinary(table: String, dedupToken: String, body: Array[Byte]): Unit
    def executeDdl(sql: String): Unit
  }

  /** Thrown on 401/403 — fatal, do not retry (client.rs:113-119). */
  class ChAuthException(msg: String) extends RuntimeException(msg)
  /** Thrown on request timeout — retryable backpressure (client.rs:91-98). */
  class ChBackpressureException(msg: String) extends RuntimeException(msg)

  /**
   * ClickHouse HTTP client (client.rs:24-152): POST with `?query=INSERT INTO
   * db.table FORMAT RowBinary&insert_deduplication_token=…` and the RowBinary
   * body; DDL goes in the POST *body* with no query param (query-in-URL with
   * an empty body triggers HTTP 411, client.rs:61-63). Auth headers are
   * paired: X-ClickHouse-Key is always sent alongside X-ClickHouse-User,
   * empty when there is no password (client.rs:80-87). One shared client,
   * explicit connect + request timeouts.
   */
  class ClickHouseHttpClient(
      baseUrl: String,
      database: String,
      user: Option[String] = None,
      password: Option[String] = None,
      timeout: Duration = Duration.ofSeconds(30)) extends ChTransport {

    @transient private lazy val http =
      HttpClient.newBuilder().connectTimeout(timeout).build()

    def insertQuery(table: String): String =
      s"INSERT INTO $database.$table FORMAT RowBinary"

    private def post(query: Option[String], extra: Seq[(String, String)], body: Array[Byte]): Unit = {
      val params = query.map("query" -> _).toSeq ++ extra
      val qs = params.map { case (k, v) =>
        s"${URLEncoder.encode(k, "UTF-8")}=${URLEncoder.encode(v, "UTF-8")}"
      }.mkString("&")
      val url = if (qs.isEmpty) baseUrl else s"${baseUrl.stripSuffix("/")}/?$qs"
      val b = HttpRequest.newBuilder(URI.create(url)).timeout(timeout)
        .POST(HttpRequest.BodyPublishers.ofByteArray(body))
      user.foreach { u =>
        b.header("X-ClickHouse-User", u)
        b.header("X-ClickHouse-Key", password.getOrElse(""))
      }
      val resp =
        try http.send(b.build(), HttpResponse.BodyHandlers.ofString())
        catch {
          case e: java.net.http.HttpTimeoutException =>
            throw new ChBackpressureException(s"clickhouse request timeout after $timeout: ${e.getMessage}")
        }
      resp.statusCode() match {
        case ok if ok >= 200 && ok < 300 => ()
        case 401 | 403 => throw new ChAuthException(s"clickhouse auth: ${resp.body()}")
        case code => throw new java.io.IOException(s"clickhouse $code: ${resp.body()}")
      }
    }

    override def insertRowBinary(table: String, dedupToken: String, body: Array[Byte]): Unit =
      post(Some(insertQuery(table)), Seq("insert_deduplication_token" -> dedupToken), body)

    override def executeDdl(sql: String): Unit =
      post(None, Nil, sql.getBytes(UTF_8))
  }

  // ————————————————————————— projection —————————————————————————

  /** How `_version` is derived (version.rs:25-36). */
  sealed trait VersionSource
  case object TsMs extends VersionSource
  /** PG LSN `X/Y` → (X<<32)|Y, falls back to ts_ms (MySQL path, version.rs:21-24). */
  case object SourcePosition extends VersionSource

  /** Declarative LSN → monotonic u64 (version.rs:12-17), null on malformed. */
  def lsnToLong(lsn: Column): Column =
    when(lsn.rlike("^[0-9a-fA-F]+/[0-9a-fA-F]+$"),
      shiftleft(conv(split_part(lsn, lit("/"), lit(1)), 16, 10).cast(LongType), 32)
        .bitwiseOR(conv(split_part(lsn, lit("/"), lit(2)), 16, 10).cast(LongType)))

  def versionColumn(source: VersionSource): Column = source match {
    case TsMs => greatest(coalesce(col("ts_ms"), lit(0L)), lit(0L))
    case SourcePosition =>
      coalesce(lsnToLong(col("source.lsn")), greatest(coalesce(col("ts_ms"), lit(0L)), lit(0L)))
  }

  /** Meta-column schema appended after the user columns (project.rs:3-6). */
  val metaSchema: StructType = StructType(Seq(
    StructField("_op", StringType, nullable = false),
    StructField("_version", LongType, nullable = false), // UInt64 on the wire — same LE bytes
    StructField("_deleted", BooleanType, nullable = false), // UInt8 on the wire
    StructField("_source_ts", LongType, nullable = false) // DateTime64(3) = Int64 millis
  ))

  /**
   * Declarative projection of the change-event envelope into the RowBinary
   * row schema: typed user columns decoded from the op-appropriate JSON
   * image (delete → before, everything else → after; project.rs:39-42),
   * then `_op`, `_version`, `_deleted`, `_source_ts`.
   */
  def projectEvents(batch: DataFrame, userSchema: StructType, versionSource: VersionSource): DataFrame = {
    val image = when(col("op") === ChangeEvent.Op.Delete, col("before")).otherwise(col("after"))
    // parse ONCE in a staging projection — per-field from_json(...).getField
    // gets schema-pruned into one parse per column by OptimizeCsvJsonExprs
    // (same finding as LakeProjection.apply). Flat primitive schemas take
    // the fused byte-level decoder (JsonDecode, from_json-identical by
    // spec); others fall back to builtin from_json inside fusedFromJson.
    val staged = batch.select(col("*"),
      graft.functions.JsonDecode.fusedFromJson(image, userSchema).as("__ch_parsed"))
    val parsed = col("__ch_parsed")
    val userCols = userSchema.fieldNames.map(f => parsed.getField(f).as(f))
    val metaCols = Seq(
      coalesce(col("op"), lit("")).as("_op"),
      versionColumn(versionSource).as("_version"),
      (col("op") === ChangeEvent.Op.Delete).as("_deleted"),
      coalesce(col("ts_ms"), lit(0L)).as("_source_ts"))
    staged.select((userCols.toSeq ++ metaCols): _*)
  }

  /** The full wire schema: user columns + meta. */
  def wireSchema(userSchema: StructType): StructType =
    StructType(userSchema.fields.toSeq ++ metaSchema.fields)

  /**
   * Rows that cannot encode: a non-nullable target column is null after the
   * JSON decode (missing field, type mismatch, or op with no image) — the
   * declarative twin of the reference's per-row `EncodeError` → DLQ path
   * (sink.rs:130-144, rowbinary.rs:65-70).
   */
  def encodable(userSchema: StructType): Column = {
    val image = when(col("op") === ChangeEvent.Op.Delete, col("before")).otherwise(col("after"))
    val parsed = graft.functions.JsonDecode.fusedFromJson(image, userSchema)
    userSchema.fields.filterNot(_.nullable)
      .map(f => parsed.getField(f.name).isNotNull)
      .reduceOption(_ && _).getOrElse(lit(true))
  }

  // ————————————————————————— the sink —————————————————————————

  /**
   * ClickHouse sink: project → split off un-encodable rows into the DLQ
   * journal → encode RowBinary per partition → one `INSERT … FORMAT
   * RowBinary` per partition with a deterministic dedup token, so a
   * replayed micro-batch re-sends byte-identical inserts with identical
   * tokens and the server drops them (the reference's
   * `insert_deduplication_token` exactly-once shape, sink.rs:147-158 —
   * there the token is per send_batch call; here the Spark partition is
   * the delivery unit, so batchId+partitionId key it).
   *
   * The target table is auto-created once via [[ClickHouseDdl.createTable]]
   * (CREATE TABLE IF NOT EXISTS; ReplacingMergeTree for upsert mode) —
   * sink.rs:81-92.
   */
  class ClickHouseSink(
      val id: String,
      pipeline: String,
      transportFactory: () => ChTransport,
      database: String,
      table: String,
      userSchema: StructType,
      primaryKey: Seq[String],
      mode: ClickHouseDdl.Mode = ClickHouseDdl.Upsert,
      versionSource: VersionSource = SourcePosition,
      autoCreate: Boolean = true,
      dlq: Option[Dlq.Config] = None) extends EventSink {

    // Fail fast at CONSTRUCTION on any type this sink cannot deliver:
    // both the DDL mapping AND the RowBinary encoder must support it —
    // ClickHouseDdl.chType alone accepts Array/Map, which would otherwise
    // surface as a per-row encode exception that fails every micro-batch.
    wireSchema(userSchema).fields.foreach { f =>
      ClickHouseDdl.chType(f.dataType)
      require(RowBinary.encodes(f.dataType),
        s"ClickHouse sink $id: column '${f.name}' has type " +
          s"${f.dataType.simpleString}, which has no RowBinary encoding")
    }

    @transient private lazy val tableEnsured = new java.util.concurrent.atomic.AtomicBoolean(false)

    override def write(batch: DataFrame, batchId: Long): Unit = {
      // latch only AFTER the DDL succeeds: latching before means one failed
      // CREATE TABLE (timeout/5xx) is never retried and every later batch
      // fails against a missing table until the query restarts
      if (autoCreate && !tableEnsured.get()) {
        transportFactory().executeDdl(
          ClickHouseDdl.createTable(database, table, userSchema, primaryKey, mode))
        tableEnsured.set(true) // idempotent DDL: a racing duplicate is harmless
      }
      val good = dlq match {
        case Some(cfg) => Dlq.splitAndJournal(cfg, batch, encodable(userSchema),
          "Serialization", lit("row cannot encode for its ClickHouse column type"))
        case None => batch.filter(encodable(userSchema))
      }
      val projected = projectEvents(good, userSchema, versionSource)
      val schema = wireSchema(userSchema)
      val (tf, tbl, pl, sid) = (transportFactory, table, pipeline, id)
      projected.foreachPartition { (rows: Iterator[Row]) =>
        if (rows.nonEmpty) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val out = new ByteArrayOutputStream(1 << 16)
          var n = 0L
          rows.foreach { r => RowBinary.encodeRow(out, schema, r); n += 1 }
          // deterministic across replays of the same micro-batch partition
          val token = s"$pl:$sid:$batchId:$pid:$n"
          tf().insertRowBinary(tbl, token, out.toByteArray)
        }
      }
    }
  }
}
