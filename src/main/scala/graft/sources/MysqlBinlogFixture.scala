package graft.sources

import java.nio.charset.StandardCharsets

import graft.sources.MysqlBinlog._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Binlog segment ENCODER (fixture recorder) + Spark wiring.
 *
 * There is no live MySQL in this environment, so — exactly as the reference
 * fixture-tests its decode path with in-memory events
 * (crates/sources/src/mysql/mysql_event.rs:723-770,
 * crates/sources/src/mysql/mysql_object.rs:78-173) — we RECORD wire-format
 * segments from deterministic source rows and feed them to the real decoder
 * [[MysqlBinlog.decodeSegment]]. The encoder writes the same public binlog
 * layout the decoder parses (header, TABLE_MAP, ROWS v2 bitmaps + null
 * bitmap, GTID, QUERY, XID), so every byte the decoder consumes went
 * through the documented format, not through a private shortcut.
 *
 * Scale shape: encode AND decode run inside `mapPartitions` — segments are
 * a binary column; nothing touches the driver.
 */
object MysqlBinlogFixture {

  /** Column plan entry: type code + metadata (same packing the table-map
   * metadata block uses, see [[MysqlBinlog.decodeSegment]]). */
  case class Col(name: String, typ: Int, meta: Int)

  // ——— low-level writers ———

  final class W {
    private val buf = new java.io.ByteArrayOutputStream()
    def u1(v: Int): W = { buf.write(v & 0xff); this }
    def u2(v: Int): W = { u1(v); u1(v >> 8) }
    def u3(v: Int): W = { u1(v); u1(v >> 8); u1(v >> 16) }
    def u4(v: Long): W = { u2(v.toInt); u2((v >> 16).toInt) }
    def u6(v: Long): W = { u4(v); u2((v >> 32).toInt) }
    def i8(v: Long): W = { u4(v); u4(v >>> 32) }
    def beN(v: Long, n: Int): W = { var i = n - 1; while (i >= 0) { u1(((v >> (8 * i)) & 0xff).toInt); i -= 1 }; this }
    def leN(v: Long, n: Int): W = { var i = 0; while (i < n) { u1(((v >> (8 * i)) & 0xff).toInt); i += 1 }; this }
    def raw(b: Array[Byte]): W = { buf.write(b, 0, b.length); this }
    def str0(s: String): W = { raw(s.getBytes(StandardCharsets.UTF_8)); u1(0) }
    def lenenc(v: Long): W =
      if (v < 0xfb) u1(v.toInt)
      else if (v < 0x10000) { u1(0xfc); u2(v.toInt) }
      else if (v < 0x1000000) { u1(0xfd); u3(v.toInt) }
      else { u1(0xfe); i8(v) }
    def bytes: Array[Byte] = buf.toByteArray
  }

  /** Wrap a body in a v4 event header. `pos` lands in header.next_pos. */
  def event(eventType: Int, tsSec: Long, pos: Long, body: Array[Byte]): Array[Byte] = {
    val w = new W
    w.u4(tsSec).u1(eventType).u4(1L /*server id*/)
    w.u4(19L + body.length).u4(pos).u2(0)
    w.raw(body).bytes
  }

  def tableMap(tableId: Long, db: String, table: String, cols: Seq[Col],
               tsSec: Long, pos: Long): Array[Byte] = {
    val w = new W
    w.u6(tableId).u2(0)
    w.u1(db.length).str0(db)
    w.u1(table.length).str0(table)
    w.lenenc(cols.size)
    cols.foreach(c => w.u1(c.typ))
    val mw = new W
    cols.foreach { c =>
      c.typ match {
        case T.VARCHAR | T.VAR_STRING => mw.u2(c.meta)
        case T.NEWDECIMAL => mw.u1(c.meta >> 8).u1(c.meta & 0xff)
        case T.BLOB | T.JSON => mw.u1(c.meta)
        case T.FLOAT | T.DOUBLE => mw.u1(c.meta)
        case T.STRING => mw.u1(c.meta >> 8).u1(c.meta & 0xff)
        case T.TIMESTAMP2 | T.DATETIME2 | T.TIME2 => mw.u1(c.meta)
        case T.BIT => mw.u1(c.meta >> 8).u1(c.meta & 0xff)
        case _ =>
      }
    }
    val meta = mw.bytes
    w.lenenc(meta.length).raw(meta)
    w.raw(Array.fill[Byte]((cols.size + 7) / 8)(0)) // null-allowed bitmap
    event(TABLE_MAP_EVENT, tsSec, pos, w.bytes)
  }

  def gtid(uuid: java.util.UUID, gno: Long, tsSec: Long, pos: Long): Array[Byte] = {
    val w = new W
    w.u1(1)
    w.beN(uuid.getMostSignificantBits, 8).beN(uuid.getLeastSignificantBits, 8)
    w.i8(gno)
    event(GTID_EVENT, tsSec, pos, w.bytes)
  }

  def query(db: String, sql: String, tsSec: Long, pos: Long): Array[Byte] = {
    val w = new W
    w.u4(1L).u4(0L) // thread id, exec time
    w.u1(db.getBytes(StandardCharsets.UTF_8).length)
    w.u2(0) // error code
    w.u2(0) // status vars
    w.raw(db.getBytes(StandardCharsets.UTF_8)).u1(0)
    w.raw(sql.getBytes(StandardCharsets.UTF_8))
    event(QUERY_EVENT, tsSec, pos, w.bytes)
  }

  def xid(id: Long, tsSec: Long, pos: Long): Array[Byte] = {
    val w = new W
    w.i8(id)
    event(XID_EVENT, tsSec, pos, w.bytes)
  }

  // ——— value encode (inverse of MysqlBinlog.decodeValue) ———

  def encodeValue(w: W, typ: Int, meta: Int, v: Any): Unit = typ match {
    case T.TINY => w.u1(v.asInstanceOf[Number].intValue())
    case T.SHORT => w.u2(v.asInstanceOf[Number].intValue())
    case T.LONG => w.u4(v.asInstanceOf[Number].longValue() & 0xffffffffL)
    case T.INT24 => w.u3(v.asInstanceOf[Number].intValue())
    case T.LONGLONG => w.i8(v.asInstanceOf[Number].longValue())
    case T.FLOAT => w.u4(java.lang.Float.floatToIntBits(v.asInstanceOf[Number].floatValue()).toLong & 0xffffffffL)
    case T.DOUBLE => w.i8(java.lang.Double.doubleToLongBits(v.asInstanceOf[Number].doubleValue()))
    case T.YEAR => w.u1(v.asInstanceOf[Number].intValue() - 1900)
    case T.DATE =>
      val d = v.asInstanceOf[java.time.LocalDate]
      w.u3(d.getDayOfMonth | (d.getMonthValue << 5) | (d.getYear << 9))
    case T.DATETIME2 =>
      val dt = v.asInstanceOf[java.time.LocalDateTime]
      val ym = dt.getYear * 13L + dt.getMonthValue
      val packed = (((ym << 5) | dt.getDayOfMonth) << 17) |
        (dt.getHour << 12) | (dt.getMinute << 6) | dt.getSecond
      w.beN(packed + 0x8000000000L, 5); fracPad(w, meta)
    case T.TIMESTAMP2 =>
      w.beN(v.asInstanceOf[Number].longValue(), 4); fracPad(w, meta)
    case T.TIME2 =>
      val secs = v.asInstanceOf[Number].longValue() // seconds-of-day, may be negative
      val a = math.abs(secs)
      val packed = ((a / 3600) << 12) | (((a % 3600) / 60) << 6) | (a % 60)
      w.beN((if (secs < 0) -packed else packed) + 0x800000L, 3); fracPad(w, meta)
    case T.BIT =>
      val bits = ((meta >> 8) & 0xff) * 8 + (meta & 0xff)
      w.beN(v.asInstanceOf[Number].longValue(), (bits + 7) / 8)
    case T.NEWDECIMAL =>
      w.raw(encodeDecimal(v.toString, (meta >> 8) & 0xff, meta & 0xff))
    case T.VARCHAR | T.VAR_STRING =>
      val b = toBytes(v)
      if (meta < 256) w.u1(b.length) else w.u2(b.length)
      w.raw(b)
    case T.STRING =>
      val b = toBytes(v)
      if ((meta & 0xff) < 256) w.u1(b.length) else w.u2(b.length)
      w.raw(b)
    case T.BLOB =>
      val b = toBytes(v)
      w.leN(b.length.toLong, meta & 0xff).raw(b)
    case T.JSON =>
      val b = jsonbEncode(v.asInstanceOf[J])
      w.leN(b.length.toLong, meta & 0xff).raw(b)
    case other => throw new IllegalArgumentException(s"unsupported column type $other")
  }

  private def fracPad(w: W, fsp: Int): Unit = (0 until (fsp + 1) / 2).foreach(_ => w.u1(0))

  private def toBytes(v: Any): Array[Byte] = v match {
    case b: Array[Byte] => b
    case s: String => s.getBytes(StandardCharsets.UTF_8)
    case other => other.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** Inverse of [[MysqlBinlog.decodeDecimal]]: plain decimal string →
   * MySQL packed format (9-digit base-1e9 groups, sign in MSB of byte 0,
   * negative = all bits inverted). */
  def encodeDecimal(s0: String, precision: Int, scale: Int): Array[Byte] = {
    val neg = s0.startsWith("-")
    val s = if (neg) s0.substring(1) else s0
    val dot = s.indexOf('.')
    val intDigits = (if (dot < 0) s else s.substring(0, dot)).dropWhile(_ == '0') match {
      case "" => ""
      case d => d
    }
    val fracDigits0 = if (dot < 0) "" else s.substring(dot + 1)
    val fracDigits = fracDigits0.padTo(scale, '0').take(scale)
    val intg = precision - scale
    require(intDigits.length <= intg, s"decimal $s0 overflows DECIMAL($precision,$scale)")
    val intPadded = ("0" * (intg - intDigits.length)) + intDigits
    val w = new W
    val dig2bytes = Array(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)
    val lead = intg % 9
    var idx = 0
    if (lead > 0) { w.beN(intPadded.substring(0, lead).toLong, dig2bytes(lead)); idx = lead }
    while (idx < intg) { w.beN(intPadded.substring(idx, idx + 9).toLong, 4); idx += 9 }
    idx = 0
    while (idx + 9 <= scale) { w.beN(fracDigits.substring(idx, idx + 9).toLong, 4); idx += 9 }
    val tail = scale - idx
    if (tail > 0) w.beN(fracDigits.substring(idx).toLong, dig2bytes(tail))
    val out = w.bytes
    if (neg) { var i = 0; while (i < out.length) { out(i) = (~out(i)).toByte; i += 1 } }
    out(0) = (out(0) ^ 0x80).toByte
    out
  }

  // ——— JSONB encode (small documents; inverse of MysqlBinlog.jsonbDecode) ———

  def jsonbEncode(j: J): Array[Byte] = {
    val w = new W
    j match {
      case JObj(_) => w.u1(0x00).raw(encodeSmallContainer(j))
      case JArr(_) => w.u1(0x02).raw(encodeSmallContainer(j))
      case JNull => w.u1(0x04).u1(0)
      case JBool(b) => w.u1(0x04).u1(if (b) 1 else 2)
      case JLong(v) if v >= Short.MinValue && v <= Short.MaxValue => w.u1(0x05).u2(v.toInt & 0xffff)
      case JLong(v) if v >= Int.MinValue && v <= Int.MaxValue => w.u1(0x07).u4(v & 0xffffffffL)
      case JLong(v) => w.u1(0x09).i8(v)
      case JDouble(v) => w.u1(0x0b).i8(java.lang.Double.doubleToLongBits(v))
      case JStr(s) =>
        val b = s.getBytes(StandardCharsets.UTF_8)
        w.u1(0x0c); varlen(w, b.length); w.raw(b)
      case JRaw(_) => throw new IllegalArgumentException("JRaw not encodable")
    }
    w.bytes
  }

  private def varlen(w: W, len0: Int): Unit = {
    var len = len0
    var cont = true
    while (cont) {
      if (len < 0x80) { w.u1(len); cont = false }
      else { w.u1((len & 0x7f) | 0x80); len >>= 7 }
    }
  }

  /** Small object/array payload. MySQL sorts object keys by (length, bytes);
   * we sort here so decode order == MySQL order. */
  private def encodeSmallContainer(j: J): Array[Byte] = {
    val (keys, values) = j match {
      case JObj(fs0) =>
        val fs = fs0.sortBy { case (k, _) => (k.length, k) }
        (fs.map(_._1), fs.map(_._2))
      case JArr(items) => (Nil, items)
      case _ => throw new IllegalArgumentException
    }
    val isObj = keys.nonEmpty || j.isInstanceOf[JObj]
    val count = values.size
    val headerSize = 4 + (if (isObj) count * 4 else 0) + count * 3
    val keyBytes = keys.map(_.getBytes(StandardCharsets.UTF_8))
    var off = headerSize
    val keyOffsets = keyBytes.map { kb => val o = off; off += kb.length; o }
    // value entries: literals/int16 inline; everything else spilled at offset
    val spills = new java.io.ByteArrayOutputStream()
    val entries = values.map {
      case JNull => (0x04, 0, null: Array[Byte])
      case JBool(b) => (0x04, if (b) 1 else 2, null: Array[Byte])
      case JLong(v) if v >= Short.MinValue && v <= Short.MaxValue => (0x05, v.toInt & 0xffff, null: Array[Byte])
      case v =>
        val enc = jsonbEncode(v)
        (enc(0) & 0xff, -1, enc.drop(1)) // type byte + payload to spill
    }.map { case (typ, inline, payload) =>
      if (payload == null) (typ, inline)
      else {
        val o = off + spills.size()
        spills.write(payload, 0, payload.length)
        (typ, o)
      }
    }
    val total = off + spills.size()
    val w = new W
    w.u2(count).u2(total)
    keyOffsets.zip(keyBytes).foreach { case (o, kb) => w.u2(o).u2(kb.length) }
    entries.foreach { case (typ, v) => w.u1(typ).u2(v) }
    keyBytes.foreach(w.raw)
    w.raw(spills.toByteArray)
    w.bytes
  }

  // ——— orders-table fixture pipeline ———

  val OrdersDb = "inventory"
  val OrdersTable = "orders"
  val OrdersTableId = 42L
  private val FixtureUuid = java.util.UUID.fromString("3e11fa47-71ca-11e1-9e33-c80aa9429562")

  /** Column plan for the orders fixture — deliberately spans the type map:
   * LONGLONG, LONG, CHAR, NEWDECIMAL, DATETIME2, nullable VARCHAR, DOUBLE,
   * TINY, JSONB and BLOB (mysql_object.rs:25-48 coverage). */
  val ordersCols: Seq[Col] = Seq(
    Col("o_orderkey", T.LONGLONG, 0),
    Col("o_custkey", T.LONG, 0),
    Col("o_orderstatus", T.STRING, (T.STRING << 8) | 1),
    Col("o_totalprice", T.NEWDECIMAL, (15 << 8) | 2),
    Col("o_orderdate", T.DATETIME2, 0),
    Col("o_orderpriority", T.VARCHAR, 20),
    Col("price_d", T.DOUBLE, 8),
    Col("tiny_flag", T.TINY, 0),
    Col("props", T.JSON, 4),
    Col("payload_bin", T.BLOB, 2))

  def rowsEvent(eventType: Int, tableId: Long, cols: Seq[Col],
                images: Seq[Seq[Seq[Any]]], tsSec: Long, pos: Long): Array[Byte] = {
    val w = new W
    w.u6(tableId).u2(0).u2(2) // flags, extra-data len (v2)
    w.lenenc(cols.size)
    val bitmapLen = (cols.size + 7) / 8
    val allIncluded = Array.fill[Byte](bitmapLen)(0)
    cols.indices.foreach(i => allIncluded(i / 8) = (allIncluded(i / 8) | (1 << (i % 8))).toByte)
    w.raw(allIncluded)
    if (eventType == UPDATE_ROWS_V2) w.raw(allIncluded)
    images.foreach { rowImages =>
      rowImages.foreach { values =>
        val nullBm = Array.fill[Byte](bitmapLen)(0)
        values.zipWithIndex.foreach { case (v, i) => if (v == null) nullBm(i / 8) = (nullBm(i / 8) | (1 << (i % 8))).toByte }
        w.raw(nullBm)
        values.zipWithIndex.foreach { case (v, i) => if (v != null) encodeValue(w, cols(i).typ, cols(i).meta, v) }
      }
    }
    event(eventType, tsSec, pos, w.bytes)
  }

  /** Fixture values for one orders row (deterministic functions of the row,
   * so the DuckDB oracle reproduces them). */
  def orderValues(pk: Long, cust: Long, status: String, price: Double,
                  dateMs: Long, prio: String): Seq[Any] = {
    val dt = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(dateMs), java.time.ZoneOffset.UTC)
    val dec = java.math.BigDecimal.valueOf(price).setScale(2, java.math.RoundingMode.HALF_UP).toPlainString
    Seq(
      pk, cust, status, dec, dt,
      if (pk % 7 == 3) null else prio,
      price,
      pk % 128,
      JObj(Seq("k" -> JLong(pk % 100), "tag" -> JStr("t" + (pk % 10)))),
      Array[Byte](0xde.toByte, 0xad.toByte, (pk % 256).toByte, 0xff.toByte))
  }

  /**
   * Encode one partition of orders rows into a binlog segment:
   * DDL QUERY + TABLE_MAP, then per row GTID + WRITE/UPDATE/DELETE (op mix
   * pk%10, same as [[CdcSynth.opFor]]), closed by XID.
   */
  def ordersSegment(rows: Iterator[(Long, Long, String, Double, Long, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ts = 1700000000L
    out.write(query(OrdersDb, "ALTER TABLE orders ADD COLUMN note VARCHAR(10)", ts, 0))
    out.write(tableMap(OrdersTableId, OrdersDb, OrdersTable, ordersCols, ts, 0))
    rows.foreach { case (pk, cust, status, price, dateMs, prio) =>
      out.write(gtid(FixtureUuid, pk + 1, ts, pk))
      val vals = orderValues(pk, cust, status, price, dateMs, prio)
      val ev = (pk % 10) match {
        case m if m <= 5 => rowsEvent(WRITE_ROWS_V2, OrdersTableId, ordersCols, Seq(Seq(vals)), ts + pk, pk)
        case m if m <= 8 => rowsEvent(UPDATE_ROWS_V2, OrdersTableId, ordersCols, Seq(Seq(vals, vals)), ts + pk, pk)
        case _ => rowsEvent(DELETE_ROWS_V2, OrdersTableId, ordersCols, Seq(Seq(vals)), ts + pk, pk)
      }
      out.write(ev)
    }
    out.write(xid(1L, ts, 0))
    out.toByteArray
  }

  /**
   * Streaming decode over [[graft.sources.BacklogSource]] lines: each
   * backlog line carries one base64-encoded binlog segment, so the DSv2
   * micro-batch machinery (offsets, admission control, checkpoint resume)
   * applies unchanged to real wire bytes — the reference's
   * binlog-stream-into-coordinator wiring (mysql_event.rs:41-121)
   * re-expressed as source → narrow decode.
   */
  def decodeBase64Segments(lines: DataFrame,
                           names: IndexedSeq[String]): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.select(unbase64(col("value")).as("seg"))
      .as[Array[Byte]](org.apache.spark.sql.Encoders.BINARY)
      .flatMap(seg => MysqlBinlog.decodeSegment(seg, (_, _) => names)).toDF()
  }

  /** Write one backlog segment file (a single base64 line) of binlog bytes. */
  def writeBacklogSegment(dir: String, name: String, segment: Array[Byte]): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"),
      java.util.Base64.getEncoder.encodeToString(segment).getBytes(StandardCharsets.UTF_8))
  }

  /** orders → binlog segments (one per partition) → decoded envelope rows.
   * Distributed end to end: narrow map, no shuffle, no driver collect. */
  def decodedOrders(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val prepped = orders.repartition(par).select(
      col("o_orderkey").cast("long"), col("o_custkey").cast("long"),
      col("o_orderstatus"), col("o_totalprice").cast("double"),
      unix_millis(col("o_orderdate").cast("timestamp")), col("o_orderpriority"))
      .as[(Long, Long, String, Double, Long, String)]
    val segments: Dataset[Array[Byte]] =
      prepped.mapPartitions(it => Iterator.single(ordersSegment(it)))(
        org.apache.spark.sql.Encoders.BINARY)
    val names = ordersCols.map(_.name).toIndexedSeq
    segments.flatMap { seg =>
      MysqlBinlog.decodeSegment(seg,
        (_, _) => names) // schema provider (load_schema equivalent)
    }.toDF()
  }
}
