package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, EOFException, InputStream, OutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/**
 * MySQL client/server wire protocol — the live-socket transport in front of
 * [[MysqlBinlog.decodeSegment]]: packet framing, the HandshakeV10 →
 * HandshakeResponse41 exchange with `mysql_native_password` scrambling, and
 * `COM_BINLOG_DUMP_GTID`, after which the server streams binlog events that
 * feed the existing decoder unchanged.
 *
 * Reference: crates/sources/src/mysql/mod.rs:63-114 drives the same
 * sequence through mysql_async's BinlogStream; the protocol itself is the
 * public MySQL client/server protocol (packet framing, handshake, and the
 * binlog dump command family).
 *
 * Both sides of each exchange are implemented (encode AND decode) so the
 * spec can run a live TCP stub server that authenticates, parses the dump
 * request, and streams fixture events — proving connect → auth → dump →
 * decode → reconnect-resume end to end on real sockets.
 */
object MysqlWire {

  // —————————————————— packet framing: [len:3 LE][seq:1][payload] ——————————————————
  // Payloads ≥ 16MB-1 follow MySQL's splitting rule: a packet whose length
  // is exactly 0xffffff is continued by the next packet (possibly an empty
  // one, so a payload of exactly k·0xffffff bytes still terminates).

  private val MaxChunk = 0xffffff

  /**
   * Writes `payload`, splitting ≥16MB-1 bodies, and returns the NEXT
   * sequence number — splitting consumes one sequence per chunk, and a
   * caller that keeps numbering from `seq + 1` after a split write would
   * silently desynchronize the conversation.
   */
  def writePacket(out: OutputStream, seq: Int, payload: Array[Byte]): Int = {
    var off = 0
    var s = seq
    var continue = true
    while (continue) {
      val len = math.min(MaxChunk, payload.length - off)
      out.write(len & 0xff)
      out.write((len >> 8) & 0xff)
      out.write((len >> 16) & 0xff)
      out.write(s & 0xff)
      out.write(payload, off, len)
      off += len
      s += 1
      // a full 0xffffff chunk REQUIRES a follow-up (empty if nothing remains)
      continue = len == MaxChunk
    }
    out.flush()
    s
  }

  /** (sequence-of-first-packet, payload) — rejoins 0xffffff continuations. */
  def readPacket(in: InputStream): (Int, Array[Byte]) = {
    def b(): Int = {
      val v = in.read()
      if (v < 0) throw new EOFException("mysql: connection closed")
      v
    }
    def one(): (Int, Int, Array[Byte]) = {
      val len = b() | (b() << 8) | (b() << 16)
      val seq = b()
      val payload = new Array[Byte](len)
      var off = 0
      while (off < len) {
        val n = in.read(payload, off, len - off)
        if (n < 0) throw new EOFException("mysql: connection closed mid-packet")
        off += n
      }
      (len, seq, payload)
    }
    val (len0, seq0, first) = one()
    if (len0 < MaxChunk) (seq0, first)
    else {
      val joined = new ByteArrayOutputStream()
      joined.write(first)
      var expect = seq0
      var more = true
      while (more) {
        val (len, seq, part) = one()
        // continuations must increment mod 256 — a skew means the stream
        // lost framing and every later "payload" would be garbage
        expect = (expect + 1) & 0xff
        if (seq != expect)
          throw new java.io.IOException(
            s"mysql: continuation packet sequence $seq, expected $expect — framing lost")
        joined.write(part)
        more = len == MaxChunk
      }
      (seq0, joined.toByteArray)
    }
  }

  // —————————————————— little-endian scratch writers/readers ——————————————————

  class W {
    val buf = new ByteArrayOutputStream()
    def u1(v: Int): W = { buf.write(v & 0xff); this }
    def u2(v: Int): W = { u1(v); u1(v >> 8) }
    def u4(v: Long): W = { u2(v.toInt); u2((v >> 16).toInt) }
    def u8(v: Long): W = { u4(v); u4(v >>> 32) }
    def raw(b: Array[Byte]): W = { buf.write(b, 0, b.length); this }
    def str0(s: String): W = { raw(s.getBytes(UTF_8)); u1(0) }
    /** Length-encoded integer (protocol "int<lenenc>"). */
    def lenc(v: Long): W =
      if (v < 251L) u1(v.toInt)
      else if (v < 65536L) { u1(0xfc); u2(v.toInt) }
      else if (v < 16777216L) { u1(0xfd); u1(v.toInt); u1((v >> 8).toInt); u1((v >> 16).toInt) }
      else { u1(0xfe); u8(v) }
    /** Length-encoded string (protocol "string<lenenc>"). */
    def lencStr(s: String): W = { val b = s.getBytes(UTF_8); lenc(b.length.toLong); raw(b) }
    def bytes: Array[Byte] = buf.toByteArray
  }

  class R(val b: Array[Byte], var off: Int) {
    def u1(): Int = { val v = b(off) & 0xff; off += 1; v }
    def u2(): Int = u1() | (u1() << 8)
    def u4(): Long = (u2().toLong & 0xffff) | ((u2().toLong & 0xffff) << 16)
    def u8(): Long = u4() | (u4() << 32)
    def strN(n: Int): String = { val s = new String(b, off, n, UTF_8); off += n; s }
    def str0(): String = {
      val start = off
      while (b(off) != 0) off += 1
      val s = new String(b, start, off - start, UTF_8)
      off += 1
      s
    }
    def rawN(n: Int): Array[Byte] = { val a = java.util.Arrays.copyOfRange(b, off, off + n); off += n; a }
    /** Length-encoded integer (protocol "int<lenenc>"). */
    def lenc(): Long = u1() match {
      case 0xfc => u2().toLong
      case 0xfd => (u1() | (u1() << 8) | (u1() << 16)).toLong
      case 0xfe => u8()
      case v => v.toLong
    }
    def remaining: Int = b.length - off
  }

  // —————————————————— auth: mysql_native_password ——————————————————

  /** SHA1(pass) XOR SHA1(nonce ++ SHA1(SHA1(pass))) — the 20-byte scramble. */
  def nativePasswordScramble(password: String, nonce: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.empty
    val sha1 = MessageDigest.getInstance("SHA-1")
    val p1 = sha1.digest(password.getBytes(UTF_8))
    sha1.reset()
    val p2 = sha1.digest(p1)
    sha1.reset()
    sha1.update(nonce, 0, 20)
    sha1.update(p2)
    val mix = sha1.digest()
    p1.indices.toArray.map(i => (p1(i) ^ mix(i)).toByte)
  }

  // capabilities the client advertises
  val CapLongPassword = 0x1L
  val CapProtocol41 = 0x200L
  val CapSecureConnection = 0x8000L
  val CapPluginAuth = 0x80000L

  case class Greeting(serverVersion: String, connectionId: Long, nonce: Array[Byte],
                      capabilities: Long, authPlugin: String)

  /** Server side: HandshakeV10 bytes. */
  def encodeGreeting(serverVersion: String, connectionId: Long, nonce20: Array[Byte]): Array[Byte] = {
    require(nonce20.length == 20, "nonce must be 20 bytes")
    val caps = CapLongPassword | CapProtocol41 | CapSecureConnection | CapPluginAuth
    new W()
      .u1(10) // protocol version
      .str0(serverVersion)
      .u4(connectionId)
      .raw(nonce20.take(8)).u1(0) // auth-plugin-data part 1 + filler
      .u2(caps.toInt) // capability flags lower
      .u1(33) // charset utf8_general_ci
      .u2(2) // status: autocommit
      .u2((caps >> 16).toInt) // capability flags upper
      .u1(21) // auth plugin data total length (20 + NUL)
      .raw(new Array[Byte](10)) // reserved
      .raw(nonce20.drop(8)).u1(0) // part 2 + NUL
      .str0("mysql_native_password")
      .bytes
  }

  def decodeGreeting(payload: Array[Byte]): Greeting = {
    val r = new R(payload, 0)
    val proto = r.u1()
    require(proto == 10, s"mysql: unsupported protocol version $proto")
    val version = r.str0()
    val connId = r.u4()
    val auth1 = r.rawN(8)
    r.u1() // filler
    val capLow = r.u2().toLong
    r.u1() // charset
    r.u2() // status
    val capHigh = r.u2().toLong
    val authLen = r.u1()
    r.rawN(10) // reserved
    val caps = capLow | (capHigh << 16)
    // part 2 field is max(13, authLen-8) bytes, NUL-terminated: take the
    // DECLARED length (authLen-8-1), not takeWhile(!=0) — a zero byte
    // inside the nonce must not truncate it
    val part2Field = r.rawN(math.max(13, authLen - 8))
    val auth2 = part2Field.take(math.max(0, authLen - 8 - 1))
    val plugin = if ((caps & CapPluginAuth) != 0 && r.remaining > 0) r.str0() else "mysql_native_password"
    Greeting(version, connId, auth1 ++ auth2, caps, plugin)
  }

  /** Client side: HandshakeResponse41. */
  def encodeHandshakeResponse(user: String, password: String, nonce: Array[Byte]): Array[Byte] = {
    val caps = CapLongPassword | CapProtocol41 | CapSecureConnection | CapPluginAuth
    val scramble = nativePasswordScramble(password, nonce)
    new W()
      .u4(caps)
      .u4(1 << 24) // max packet size
      .u1(33) // charset
      .raw(new Array[Byte](23))
      .str0(user)
      .u1(scramble.length).raw(scramble)
      .str0("mysql_native_password")
      .bytes
  }

  case class HandshakeResponse(user: String, scramble: Array[Byte])

  def decodeHandshakeResponse(payload: Array[Byte]): HandshakeResponse = {
    val r = new R(payload, 0)
    r.u4(); r.u4(); r.u1(); r.rawN(23)
    val user = r.str0()
    val n = r.u1()
    HandshakeResponse(user, r.rawN(n))
  }

  def okPacket(): Array[Byte] = new W().u1(0).u1(0).u1(0).u2(2).u2(0).bytes
  def errPacket(code: Int, msg: String): Array[Byte] =
    new W().u1(0xff).u2(code).raw("#HY000".getBytes(UTF_8)).raw(msg.getBytes(UTF_8)).bytes

  def requireOk(payload: Array[Byte], what: String): Unit =
    if ((payload(0) & 0xff) == 0xff) {
      val r = new R(payload, 1)
      val code = r.u2()
      throw new java.io.IOException(s"mysql: $what failed (error $code): " +
        new String(payload, r.off, payload.length - r.off, UTF_8))
    }

  // —————————————————— COM_BINLOG_DUMP_GTID (0x1e) ——————————————————

  case class DumpRequest(serverId: Long, file: String, pos: Long,
                         gtids: Seq[(java.util.UUID, Long, Long)]) // (sid, startGno, endGnoExcl)

  def encodeBinlogDumpGtid(req: DumpRequest): Array[Byte] = {
    val gtidData = {
      // SID block: u8 n_sids, then per sid: 16 UUID bytes (big-endian),
      // u8 n_intervals, and (start, end-exclusive) u8 pairs
      val w = new W().u8(req.gtids.length.toLong)
      req.gtids.foreach { case (sid, start, end) =>
        val bb = java.nio.ByteBuffer.allocate(16)
        bb.putLong(sid.getMostSignificantBits); bb.putLong(sid.getLeastSignificantBits)
        w.raw(bb.array()).u8(1L).u8(start).u8(end)
      }
      w.bytes
    }
    new W()
      .u1(0x1e)
      .u2(0) // flags
      .u4(req.serverId)
      .u4(req.file.length.toLong)
      .raw(req.file.getBytes(UTF_8))
      .u8(req.pos)
      .u4(gtidData.length.toLong)
      .raw(gtidData)
      .bytes
  }

  def decodeBinlogDumpGtid(payload: Array[Byte]): DumpRequest = {
    val r = new R(payload, 0)
    require(r.u1() == 0x1e, "not COM_BINLOG_DUMP_GTID")
    r.u2() // flags
    val serverId = r.u4()
    val nameLen = r.u4().toInt
    val file = r.strN(nameLen)
    val pos = r.u8()
    r.u4() // gtid data size
    val nSids = r.u8()
    val gtids = (0L until nSids).map { _ =>
      val sidBytes = r.rawN(16)
      val bb = java.nio.ByteBuffer.wrap(sidBytes)
      val sid = new java.util.UUID(bb.getLong, bb.getLong)
      val nIntervals = r.u8()
      var start = 0L; var end = 0L
      (0L until nIntervals).foreach { i =>
        val s = r.u8(); val e = r.u8()
        if (i == 0) { start = s; end = e } else end = e
      }
      (sid, start, end)
    }
    DumpRequest(serverId, file, pos, gtids)
  }

  // —————————————————— COM_QUERY (text protocol, scalar queries) ——————————————————
  //
  // Minimal text-protocol support for the identity/health probes a CDC
  // source issues before streaming (reference mysql_health.rs:317-337
  // `SELECT @@global.server_uuid`) — NOT a general SQL client. Symmetric
  // encode (test stubs play the server) + decode (BinlogClient.queryScalar).

  def encodeComQuery(sql: String): Array[Byte] =
    new W().u1(0x03).raw(sql.getBytes(UTF_8)).bytes

  def decodeComQuery(payload: Array[Byte]): String = {
    require((payload(0) & 0xff) == 0x03, "not COM_QUERY")
    new String(payload, 1, payload.length - 1, UTF_8)
  }

  /**
   * Server-side single-column text resultset as a payload sequence
   * (column-count, column-definition, EOF, one row per value — NULL as
   * 0xfb, EOF). Protocol-41 without CLIENT_DEPRECATE_EOF.
   */
  def textResultSet(colName: String, rows: Seq[Option[String]]): Seq[Array[Byte]] = {
    val colCount = new W().lenc(1L).bytes
    val colDef = new W()
      .lencStr("def").lencStr("").lencStr("").lencStr("")
      .lencStr(colName).lencStr(colName)
      .lenc(0x0cL) // fixed-length fields block
      .u2(33) // utf8_general_ci
      .u4(255L) // column length
      .u1(0xfd) // MYSQL_TYPE_VAR_STRING
      .u2(0) // flags
      .u1(0) // decimals
      .u2(0) // filler
      .bytes
    val eof = Array[Byte](0xfe.toByte, 0, 0, 2, 0)
    val rowPackets = rows.map {
      case Some(v) => new W().lencStr(v).bytes
      case None => Array(0xfb.toByte)
    }
    Seq(colCount, colDef, eof) ++ rowPackets :+ eof
  }

  // —————————————————— the binlog client ——————————————————

  /**
   * Connect → authenticate → COM_BINLOG_DUMP_GTID → stream events into
   * `onEvent(rawEventBytes, endPos)`; return normally when the server
   * finishes (EOF packet) and propagate IOException on a dropped
   * connection so the caller can reconnect from its checkpoint.
   * `onEvent` returning false stops the tail (clean client stop).
   */
  class BinlogClient(host: String, port: Int, user: String, password: String,
                     serverId: Long = 101L, connectTimeoutMs: Int = 5000,
                     readTimeoutMs: Int = 30000) {

    private def withConn[T](f: (java.io.InputStream, java.io.OutputStream) => T): T = {
      val socket = new Socket()
      try {
        socket.connect(new InetSocketAddress(host, port), connectTimeoutMs)
        socket.setSoTimeout(readTimeoutMs)
        val in = new BufferedInputStream(socket.getInputStream, 1 << 16)
        val out = new BufferedOutputStream(socket.getOutputStream, 1 << 16)

        // handshake
        val (_, greetingBytes) = readPacket(in)
        requireOk(greetingBytes, "greeting") // server may greet with ERR
        val greeting = decodeGreeting(greetingBytes)
        writePacket(out, 1, encodeHandshakeResponse(user, password, greeting.nonce))
        val (_, authAck) = readPacket(in)
        requireOk(authAck, "authentication")

        f(in, out)
      } finally socket.close()
    }

    /**
     * First column of the first row of a text-protocol query (the identity
     * probe's shape). None when the server answers OK-without-resultset,
     * ERR (variable unavailable — the reference's "cannot detect failover"
     * `Ok(None)`, mysql_health.rs:314-316), or a NULL value. Connection
     * errors still propagate as IOException — a dead server is not "the
     * variable is unset".
     */
    def queryScalar(sql: String): Option[String] = withConn { (in, out) =>
      writePacket(out, 0, encodeComQuery(sql))
      val (_, first) = readPacket(in)
      (first(0) & 0xff) match {
        case 0x00 | 0xff => None
        case _ =>
          val colCount = new R(first, 0).lenc().toInt
          (1 to colCount).foreach(_ => readPacket(in)) // column definitions
          var p = readPacket(in)._2
          if ((p(0) & 0xff) == 0xfe && p.length < 9) p = readPacket(in)._2 // post-columns EOF
          var result: Option[String] = None
          var done = false
          while (!done) {
            (p(0) & 0xff) match {
              case 0xfe if p.length < 9 => done = true // EOF closes the resultset
              case 0xff => done = true // mid-stream ERR
              case 0xfb =>
                if (!done) p = readPacket(in)._2 // NULL row — keep result None
              case _ =>
                if (result.isEmpty) {
                  val r = new R(p, 0)
                  result = Some(r.strN(r.lenc().toInt))
                }
                p = readPacket(in)._2
            }
          }
          result
      }
    }

    def tail(file: String, pos: Long)(onEvent: (Array[Byte], Long) => Boolean): Unit =
      withConn { (in, out) =>
        // dump request (new command resets sequence)
        writePacket(out, 0, encodeBinlogDumpGtid(DumpRequest(serverId, file, pos, Nil)))

        // event stream: each packet = [0x00][binlog event]; 0xfe short packet = EOF
        var going = true
        while (going) {
          val (_, p) = readPacket(in)
          (p(0) & 0xff) match {
            case 0x00 =>
              val event = java.util.Arrays.copyOfRange(p, 1, p.length)
              // header: ts u4, type u1, server u4, len u4, logPos u4 @ offset 13
              val endPos = new R(event, 13).u4()
              going = onEvent(event, endPos)
            case 0xfe if p.length < 9 => going = false // EOF
            case 0xff => requireOk(p, "binlog stream")
            case other => throw new java.io.IOException(s"mysql: unexpected packet marker $other")
          }
        }
      }
  }
}
