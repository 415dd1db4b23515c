package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/**
 * PostgreSQL frontend/backend protocol for logical replication — the
 * live-socket transport in front of [[PgOutput.decodeSegment]]: startup
 * with `replication=database`, simple-query `IDENTIFY_SYSTEM`,
 * `START_REPLICATION SLOT ... LOGICAL` entering CopyBoth mode, XLogData
 * ('w') and keepalive ('k') stream handling, and Standby Status Update
 * ('r') acks carrying the flushed LSN.
 *
 * Reference: crates/sources/src/postgres/mod.rs:74-87 drives the same
 * sequence through tokio-postgres' replication API; the protocol itself is
 * the public PG message flow (protocol 3.0).
 *
 * Both directions are implemented so the spec can run a live TCP stub
 * server that accepts the slot request and streams fixture pgoutput
 * messages — connect → identify → start replication → decode →
 * reconnect-resume, on real sockets.
 */
object PgWire {

  // —————————————————— message framing ——————————————————

  /** Typed backend/frontend message: [type:1][len:4 BE incl len][body]. */
  def writeMsg(out: OutputStream, typ: Char, body: Array[Byte]): Unit = {
    out.write(typ)
    writeInt(out, body.length + 4)
    out.write(body)
    out.flush()
  }

  /** Startup has no type byte: [len:4][protocol:4][k\0v\0...\0]. */
  def writeStartup(out: OutputStream, params: Seq[(String, String)]): Unit = {
    val body = new ByteArrayOutputStream()
    body.write(intBytes(196608)) // protocol 3.0
    params.foreach { case (k, v) =>
      body.write(k.getBytes(UTF_8)); body.write(0)
      body.write(v.getBytes(UTF_8)); body.write(0)
    }
    body.write(0)
    writeInt(out, body.size() + 4)
    body.writeTo(out)
    out.flush()
  }

  def readStartup(in: InputStream): Map[String, String] = {
    val len = readInt(in)
    val body = readN(in, len - 4)
    val proto = ((body(0) & 0xff) << 24) | ((body(1) & 0xff) << 16) | ((body(2) & 0xff) << 8) | (body(3) & 0xff)
    require(proto == 196608, s"pg: unsupported protocol $proto")
    val params = scala.collection.mutable.Map[String, String]()
    var i = 4
    while (i < body.length && body(i) != 0) {
      val kEnd = body.indexOf(0.toByte, i)
      val k = new String(body, i, kEnd - i, UTF_8)
      val vEnd = body.indexOf(0.toByte, kEnd + 1)
      params(k) = new String(body, kEnd + 1, vEnd - kEnd - 1, UTF_8)
      i = vEnd + 1
    }
    params.toMap
  }

  /** (type, body). */
  def readMsg(in: InputStream): (Char, Array[Byte]) = {
    val t = in.read()
    if (t < 0) throw new EOFException("pg: connection closed")
    val len = readInt(in)
    (t.toChar, readN(in, len - 4))
  }

  private def readN(in: InputStream, n: Int): Array[Byte] = {
    val a = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(a, off, n - off)
      if (r < 0) throw new EOFException("pg: connection closed mid-message")
      off += r
    }
    a
  }

  private def readInt(in: InputStream): Int = {
    val b = readN(in, 4)
    ((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) | ((b(2) & 0xff) << 8) | (b(3) & 0xff)
  }
  private def writeInt(out: OutputStream, v: Int): Unit = out.write(intBytes(v))
  private def intBytes(v: Int): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def longBytes(v: Long): Array[Byte] = intBytes((v >>> 32).toInt) ++ intBytes(v.toInt)
  private def readLongAt(b: Array[Byte], off: Int): Long = {
    var v = 0L
    (0 until 8).foreach(i => v = (v << 8) | (b(off + i) & 0xffL))
    v
  }

  // —————————————————— canned backend messages (stub side) ——————————————————

  def authenticationOk(): (Char, Array[Byte]) = ('R', intBytes(0))
  def readyForQuery(): (Char, Array[Byte]) = ('Z', Array('I'.toByte))
  def copyBothResponse(): (Char, Array[Byte]) =
    ('W', Array(0.toByte, 0.toByte, 0.toByte)) // text format, 0 columns
  def commandComplete(tag: String): (Char, Array[Byte]) =
    ('C', tag.getBytes(UTF_8) :+ 0.toByte)
  def errorResponse(msg: String): (Char, Array[Byte]) = {
    val body = new ByteArrayOutputStream()
    body.write('S'); body.write("ERROR".getBytes(UTF_8)); body.write(0)
    body.write('M'); body.write(msg.getBytes(UTF_8)); body.write(0)
    body.write(0)
    ('E', body.toByteArray)
  }

  /** Single-row result (RowDescription + DataRow) for IDENTIFY_SYSTEM. */
  def singleRow(cols: Seq[(String, String)]): Seq[(Char, Array[Byte])] = {
    val rd = new ByteArrayOutputStream()
    rd.write(shortBytes(cols.length))
    cols.foreach { case (name, _) =>
      rd.write(name.getBytes(UTF_8)); rd.write(0)
      rd.write(intBytes(0)); rd.write(shortBytes(0)); rd.write(intBytes(25)) // oid text
      rd.write(shortBytes(-1)); rd.write(intBytes(-1)); rd.write(shortBytes(0))
    }
    val dr = new ByteArrayOutputStream()
    dr.write(shortBytes(cols.length))
    cols.foreach { case (_, v) =>
      val b = v.getBytes(UTF_8); dr.write(intBytes(b.length)); dr.write(b, 0, b.length)
    }
    Seq(('T', rd.toByteArray), ('D', dr.toByteArray))
  }
  private def shortBytes(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)

  // —————————————————— LSN formatting ——————————————————

  def lsnToString(lsn: Long): String = f"${(lsn >>> 32).toInt}%X/${lsn.toInt}%X"
  def parseLsn(s: String): Long = {
    val Array(hi, lo) = s.split('/')
    (java.lang.Long.parseLong(hi, 16) << 32) | java.lang.Long.parseLong(lo, 16)
  }

  // —————————————————— CopyData payloads ——————————————————

  /** XLogData: 'w' [walStart:8][walEnd:8][serverTsMicros:8][pgoutput bytes]. */
  def xlogData(walStart: Long, walEnd: Long, payload: Array[Byte]): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    b.write('w')
    b.write(longBytes(walStart)); b.write(longBytes(walEnd)); b.write(longBytes(0L))
    b.write(payload, 0, payload.length)
    b.toByteArray
  }

  /** Primary keepalive: 'k' [walEnd:8][serverTs:8][replyRequested:1]. */
  def keepalive(walEnd: Long, replyRequested: Boolean): Array[Byte] =
    ('k'.toByte +: (longBytes(walEnd) ++ longBytes(0L))) :+ (if (replyRequested) 1 else 0).toByte

  /** Standby Status Update: 'r' [written:8][flushed:8][applied:8][ts:8][reply:1]. */
  def statusUpdate(written: Long, flushed: Long, applied: Long): Array[Byte] =
    ('r'.toByte +: (longBytes(written) ++ longBytes(flushed) ++ longBytes(applied) ++ longBytes(0L))) :+ 0.toByte

  case class StatusUpdate(written: Long, flushed: Long, applied: Long)
  def decodeStatusUpdate(copyData: Array[Byte]): StatusUpdate = {
    require(copyData(0) == 'r', "not a standby status update")
    StatusUpdate(readLongAt(copyData, 1), readLongAt(copyData, 9), readLongAt(copyData, 17))
  }

  // —————————————————— the replication client ——————————————————

  /**
   * Connect with `replication=database`, IDENTIFY_SYSTEM, then
   * START_REPLICATION from `startLsn`; stream XLogData into
   * `onMessage(walStart, pgoutputBytes)` (return false to stop cleanly)
   * and acknowledge progress with Standby Status Updates on every
   * reply-requested keepalive. IOException propagates on a dropped
   * connection so the caller reconnects from its flushed LSN.
   */
  class ReplicationClient(host: String, port: Int, user: String, database: String,
                          slot: String, publication: String,
                          connectTimeoutMs: Int = 5000, readTimeoutMs: Int = 30000) {

    def identifySystem(): Map[String, String] = withConn { (in, out) =>
      Map.empty ++ runIdentify(in, out)
    }

    private def withConn[A](body: (InputStream, OutputStream) => A): A = {
      val socket = new Socket()
      try {
        socket.connect(new InetSocketAddress(host, port), connectTimeoutMs)
        socket.setSoTimeout(readTimeoutMs)
        val in = new BufferedInputStream(socket.getInputStream, 1 << 16)
        val out = new BufferedOutputStream(socket.getOutputStream, 1 << 16)
        writeStartup(out, Seq("user" -> user, "database" -> database, "replication" -> "database"))
        var ready = false
        while (!ready) readMsg(in) match {
          case ('R', body0) =>
            val code = ((body0(0) & 0xff) << 24) | ((body0(1) & 0xff) << 16) | ((body0(2) & 0xff) << 8) | (body0(3) & 0xff)
            require(code == 0, s"pg: unsupported auth method $code")
          case ('Z', _) => ready = true
          case ('E', body0) => throw new java.io.IOException(s"pg: startup error: ${errText(body0)}")
          case _ => () // ParameterStatus / BackendKeyData
        }
        body(in, out)
      } finally socket.close()
    }

    private def errText(body: Array[Byte]): String = {
      // fields: [code:1][cstring]... terminated by 0; take 'M' (message)
      var i = 0
      while (i < body.length && body(i) != 0) {
        val code = body(i).toChar
        val end = body.indexOf(0.toByte, i + 1)
        if (code == 'M') return new String(body, i + 1, end - i - 1, UTF_8)
        i = end + 1
      }
      "unknown"
    }

    private def runIdentify(in: InputStream, out: OutputStream): Map[String, String] = {
      writeMsg(out, 'Q', "IDENTIFY_SYSTEM".getBytes(UTF_8) :+ 0.toByte)
      var cols: Seq[String] = Nil
      var row: Seq[String] = Nil
      var done = false
      while (!done) readMsg(in) match {
        case ('T', body) =>
          val n = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
          var i = 2
          cols = (0 until n).map { _ =>
            val end = body.indexOf(0.toByte, i)
            val name = new String(body, i, end - i, UTF_8)
            i = end + 1 + 18 // fixed descriptor tail
            name
          }
        case ('D', body) =>
          val n = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
          var i = 2
          row = (0 until n).map { _ =>
            val len = ((body(i) & 0xff) << 24) | ((body(i + 1) & 0xff) << 16) |
              ((body(i + 2) & 0xff) << 8) | (body(i + 3) & 0xff)
            i += 4
            if (len < 0) null
            else { val s = new String(body, i, len, UTF_8); i += len; s }
          }
        case ('C', _) => ()
        case ('Z', _) => done = true
        case ('E', body) => throw new java.io.IOException(s"pg: IDENTIFY_SYSTEM error: ${errText(body)}")
        case _ => ()
      }
      cols.zip(row).toMap
    }

    def tail(startLsn: Long)(onMessage: (Long, Array[Byte]) => Boolean): Unit = withConn { (in, out) =>
      runIdentify(in, out) // like the reference: identify before streaming
      val sql = s"START_REPLICATION SLOT $slot LOGICAL ${lsnToString(startLsn)} " +
        s"(proto_version '1', publication_names '$publication')"
      writeMsg(out, 'Q', sql.getBytes(UTF_8) :+ 0.toByte)
      var flushed = startLsn
      var going = true
      while (going) readMsg(in) match {
        case ('W', _) => () // CopyBothResponse — stream follows
        case ('d', body) => body(0).toChar match {
          case 'w' =>
            val walStart = readLongAt(body, 1)
            val payload = java.util.Arrays.copyOfRange(body, 25, body.length)
            going = onMessage(walStart, payload)
            flushed = math.max(flushed, walStart)
            if (!going) writeMsg(out, 'd', statusUpdate(flushed, flushed, flushed))
          case 'k' =>
            val replyRequested = body(17) != 0
            if (replyRequested) writeMsg(out, 'd', statusUpdate(flushed, flushed, flushed))
          case other => throw new java.io.IOException(s"pg: unexpected copydata '$other'")
        }
        case ('C', _) | ('c', _) => () // CommandComplete / CopyDone
        case ('Z', _) => going = false // stream ended server-side
        case ('E', body) => throw new java.io.IOException(s"pg: replication error: ${errText(body)}")
        case (t, _) => throw new java.io.IOException(s"pg: unexpected message '$t'")
      }
    }
  }
}
