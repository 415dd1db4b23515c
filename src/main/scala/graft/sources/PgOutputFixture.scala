package graft.sources

import java.nio.charset.StandardCharsets

import graft.sources.PgOutput._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * pgoutput segment ENCODER (fixture recorder) + Spark wiring — the PG twin
 * of [[MysqlBinlogFixture]]. No live PostgreSQL exists in this environment,
 * so deterministic source rows are recorded into wire-format segments
 * (Relation / Begin / Insert / Update / Delete / Truncate / Commit with
 * XLogData-style framing) and replayed through the real decoder
 * [[PgOutput.decodeSegment]].
 */
object PgOutputFixture {

  final class W {
    // plain growable array — ByteArrayOutputStream.write(int) is
    // synchronized and the encode half pays it per byte (same finding as
    // MysqlBinlogFixture.W)
    private var buf = new Array[Byte](64)
    private var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + n))
    def u1(v: Int): W = { ensure(1); buf(len) = (v & 0xff).toByte; len += 1; this }
    def u2(v: Int): W = { u1(v >> 8); u1(v) }
    def i4(v: Int): W = { u1(v >> 24); u1(v >> 16); u1(v >> 8); u1(v) }
    def i8(v: Long): W = { i4((v >>> 32).toInt); i4(v.toInt) }
    def raw(b: Array[Byte]): W = {
      ensure(b.length)
      System.arraycopy(b, 0, buf, len, b.length)
      len += b.length
      this
    }
    def cstr(s: String): W = { raw(s.getBytes(StandardCharsets.UTF_8)); u1(0) }
    def bytes: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  /** One framed message: [u64 lsn][u32 len][msg]. */
  def framed(lsn: Long, msg: Array[Byte]): Array[Byte] = {
    val w = new W
    w.i8(lsn).i4(msg.length).raw(msg).bytes
  }

  def relation(relId: Long, schema: String, table: String,
               cols: Seq[RelationColumn], identity: Char = 'f'): Array[Byte] = {
    val w = new W
    w.u1('R').i4(relId.toInt)
    w.cstr(schema).cstr(table)
    w.u1(identity)
    w.u2(cols.size)
    cols.foreach { c => w.u1(c.flags).cstr(c.name).i4(c.typeOid).i4(c.typeModifier) }
    w.bytes
  }

  def begin(finalLsn: Long, commitMicrosPg: Long, xid: Long): Array[Byte] = {
    val w = new W
    w.u1('B').i8(finalLsn).i8(commitMicrosPg).i4(xid.toInt).bytes
  }

  def commit(lsn: Long, endLsn: Long, commitMicrosPg: Long): Array[Byte] = {
    val w = new W
    w.u1('C').u1(0).i8(lsn).i8(endLsn).i8(commitMicrosPg).bytes
  }

  def tuple(w: W, values: Seq[PgValue]): Unit = {
    w.u2(values.size)
    values.foreach {
      case PgNull => w.u1('n')
      case PgUnchanged => w.u1('u')
      case PgText(b) => w.u1('t').i4(b.length).raw(b)
      case PgBinary(b) => w.u1('b').i4(b.length).raw(b)
    }
  }

  def insert(relId: Long, values: Seq[PgValue]): Array[Byte] = {
    val w = new W
    w.u1('I').i4(relId.toInt).u1('N')
    tuple(w, values); w.bytes
  }

  def update(relId: Long, before: Seq[PgValue], after: Seq[PgValue],
             oldMarker: Char = 'O'): Array[Byte] = {
    val w = new W
    w.u1('U').i4(relId.toInt)
    w.u1(oldMarker); tuple(w, before)
    w.u1('N'); tuple(w, after)
    w.bytes
  }

  def delete(relId: Long, before: Seq[PgValue], marker: Char = 'O'): Array[Byte] = {
    val w = new W
    w.u1('D').i4(relId.toInt).u1(marker)
    tuple(w, before); w.bytes
  }

  def truncate(relIds: Seq[Long], cascade: Boolean = false,
               restartIdentity: Boolean = false): Array[Byte] = {
    val w = new W
    w.u1('T').i4(relIds.size)
    w.u1((if (cascade) 1 else 0) | (if (restartIdentity) 2 else 0))
    relIds.foreach(id => w.i4(id.toInt))
    w.bytes
  }

  // ——— orders fixture ———

  val RelId = 16385L
  val Schema = "public"
  val Table = "orders"
  /** Unix 2023-11-14T22:13:20Z as pg-epoch micros (2000-01-01 based). */
  val CommitMicrosPg: Long = 1700000000000000L - 946684800000000L

  /** Column plan spans the OID conversion table: INT8, INT4, VARCHAR,
   * NUMERIC-as-string, TIMESTAMP, nullable TEXT, FLOAT8, BOOL, TEXT[],
   * JSONB, BYTEA hex, TOAST-able TEXT (postgres_object.rs:105-150). */
  val ordersCols: IndexedSeq[RelationColumn] = Vector(
    RelationColumn("o_orderkey", Oid.INT8, -1, 1), // key column
    RelationColumn("o_custkey", Oid.INT4, -1, 0),
    RelationColumn("o_orderstatus", Oid.VARCHAR, -1, 0),
    RelationColumn("o_totalprice", Oid.NUMERIC, -1, 0),
    RelationColumn("o_orderdate", Oid.TIMESTAMP, -1, 0),
    RelationColumn("o_orderpriority", Oid.TEXT, -1, 0),
    RelationColumn("price_d", Oid.FLOAT8, -1, 0),
    RelationColumn("flag", Oid.BOOL, -1, 0),
    RelationColumn("tags", 1009, -1, 0), // text[]
    RelationColumn("props", Oid.JSONB, -1, 0),
    RelationColumn("payload", Oid.BYTEA, -1, 0),
    RelationColumn("toast_txt", Oid.TEXT, -1, 0))

  private def txt(s: String): PgValue = PgText(s.getBytes(StandardCharsets.UTF_8))

  // hoisted per-row costs: ofPattern() compiles the pattern on every call,
  // and f"%02x" builds a java.util.Formatter per call
  private val TsFormat = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  private val HexDigits = "0123456789abcdef"

  /** Deterministic tuple values for one orders row (text protocol mode). */
  def orderValues(pk: Long, cust: Long, status: String, price: Double,
                  dateMs: Long, prio: String, toastUnchanged: Boolean): Seq[PgValue] = {
    val dt = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(dateMs), java.time.ZoneOffset.UTC)
    val dec = java.math.BigDecimal.valueOf(price).setScale(2, java.math.RoundingMode.HALF_UP).toPlainString
    val b = (pk % 256).toInt
    val bytea = new java.lang.StringBuilder(12).append("\\xdead")
      .append(HexDigits.charAt(b >> 4)).append(HexDigits.charAt(b & 0xf))
      .append("ff").toString
    Seq(
      txt(pk.toString), txt(cust.toString), txt(status), txt(dec),
      txt(dt.format(TsFormat)),
      if (pk % 7 == 3) PgNull else txt(prio),
      txt(price.toString),
      txt(if (pk % 2 == 0) "t" else "f"),
      txt(s"{t${pk % 10},x}"),
      txt(s"""{"k":${pk % 100}}"""),
      txt(bytea),
      if (toastUnchanged) PgUnchanged else txt(s"v$pk"))
  }

  /** One partition of orders rows → one pgoutput segment: Relation, then a
   * transaction of per-row Insert/Update/Delete (op mix pk%10, identical to
   * [[CdcSynth.opFor]]), Commit. */
  def ordersSegment(rows: Iterator[(Long, Long, String, Double, Long, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(framed(0L, relation(RelId, Schema, Table, ordersCols)))
    out.write(framed(0L, begin(0L, CommitMicrosPg, 77L)))
    rows.foreach { case (pk, cust, status, price, dateMs, prio) =>
      val full = orderValues(pk, cust, status, price, dateMs, prio, toastUnchanged = false)
      val msg = (pk % 10) match {
        case m if m <= 5 => insert(RelId, full)
        case m if m <= 8 =>
          val after = orderValues(pk, cust, status, price, dateMs, prio, toastUnchanged = true)
          update(RelId, full, after)
        case _ => delete(RelId, full)
      }
      out.write(framed(pk, msg))
    }
    out.write(framed(0L, commit(0L, 0L, CommitMicrosPg)))
    out.toByteArray
  }

  /** A driver-independent control segment carrying the op='t' truncate row
   * (single row regardless of partitioning). */
  def truncateSegment(): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(framed(0L, relation(RelId, Schema, Table, ordersCols)))
    out.write(framed(1L, truncate(Seq(RelId), cascade = true)))
    out.toByteArray
  }

  /** Streaming decode over [[graft.sources.BacklogSource]] `.segb64` lines
   * (base64 pgoutput segment per line) — the PG twin of
   * [[MysqlBinlogFixture.decodeBase64Segments]]. */
  def decodeBase64Segments(lines: DataFrame): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.select(unbase64(col("value")).as("seg"))
      .as[Array[Byte]](org.apache.spark.sql.Encoders.BINARY)
      .flatMap(PgOutput.decodeSegment(_)).toDF()
  }

  /** orders → pgoutput segments → decoded rows; narrow distributed map.
   *
   * `orderedByOpLsn = true` (r16): range-partition the RAW source rows on
   * the exact `(op, lsn)` STRINGS the decode will emit — both are pure
   * functions of `o_orderkey` by fixture construction (op = the
   * [[CdcSynth.opFor]] pk%10 plan; lsn = [[PgOutput.lsnString]] of the
   * per-row `framed(pk, …)` wal position, replicated below with Spark
   * `hex()`, which matches `appendUpperHex` exactly: uppercase, no leading
   * zeros, lone `0` for zero) — and fold the op='t' truncate CONTROL row
   * into the same range exchange with its own decoded keys ('t', "0/1").
   * Each decoded record inherits its source row's partition (the
   * encode→decode chain is a narrow mapPartitions), so range partitions are
   * globally ordered on (op, lsn) and a downstream `sortWithinPartitions`
   * reproduces `ORDER BY op, lsn` exactly — WITHOUT the previous
   * localCheckpoint materialization + full-width shuffle of the decoded
   * frame (before/after images are ~10× the source row; the r15 cut only
   * moved the bounds-sampling cost, the wide exchange itself remained).
   * Spec-pinned row-for-row against the orderBy shape (`PgOutputSpec`). */
  def decodedOrders(orders: DataFrame, orderedByOpLsn: Boolean = false): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val base = orders.select(
      col("o_orderkey").cast("long").as("pk"), col("o_custkey").cast("long").as("ck"),
      col("o_orderstatus").as("st"), col("o_totalprice").cast("double").as("pr"),
      unix_millis(col("o_orderdate").cast("timestamp")).as("dm"),
      col("o_orderpriority").as("pp"))
    // rotated at a bounded row count like the MySQL fixture (and like WAL
    // segment files): unbounded per-partition segments made the ×10 probe
    // measure 128× CPU for 10× data — allocation thrash, not decode cost
    def segments(rows: Dataset[(Long, Long, String, Double, Long, String, Boolean)])
        : Dataset[Array[Byte]] =
      rows.mapPartitions { it =>
        it.grouped(MysqlBinlogFixture.SegmentRows).flatMap { g =>
          val (marks, data) = g.partition(_._7)
          val segs = Seq.newBuilder[Array[Byte]]
          if (data.nonEmpty)
            segs += ordersSegment(data.iterator.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)))
          marks.foreach(_ => segs += truncateSegment())
          segs.result()
        }
      }(org.apache.spark.sql.Encoders.BINARY)
    if (orderedByOpLsn) {
      // truncate marker rides the range exchange as a source row; only pk
      // matters (wal lsn 1 == truncateSegment's framing)
      val marker = spark.range(1).select(lit(1L).as("pk"), lit(0L).as("ck"),
        lit("").as("st"), lit(0.0).as("pr"), lit(0L).as("dm"), lit("").as("pp"),
        lit(true).as("trunc"))
      val all = base.withColumn("trunc", lit(false)).unionByName(marker)
      // single source of truth (r16 ADVICE #1): the op plan IS
      // CdcSynth.opFor and the marker keys ARE ('t', lsnString(truncate's
      // framed lsn = 1)) — hand-duplicated copies silently desynced the
      // range partitioning from the decoded keys on any future edit
      val opProxy = when(col("trunc"), lit("t"))
        .otherwise(CdcSynth.opFor(col("pk")))
      val lsnProxy = when(col("trunc"), lit(PgOutput.lsnString(1L))).otherwise(concat(
        hex(shiftrightunsigned(col("pk"), 32)), lit("/"),
        hex(col("pk").bitwiseAND(lit(0xffffffffL)))))
      val spread = all.repartitionByRange(par, opProxy, lsnProxy)
        .as[(Long, Long, String, Double, Long, String, Boolean)]
      segments(spread).flatMap(PgOutput.decodeSegment(_)).toDF()
    } else {
      val prepped = base.withColumn("trunc", lit(false)).repartition(par)
        .as[(Long, Long, String, Double, Long, String, Boolean)]
      val control = spark.createDataset(Seq(truncateSegment()))(
        org.apache.spark.sql.Encoders.BINARY)
      segments(prepped).union(control).flatMap(PgOutput.decodeSegment(_)).toDF()
    }
  }
}
