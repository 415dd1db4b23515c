package graft.sources

import graft.sources.{MysqlBinlog => B, MysqlBinlogFixture => Fx}

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.ServerSocket
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

/**
 * Shared MySQL wire-protocol test server: greeting → scramble check →
 * COM_BINLOG_DUMP_GTID parse → event stream sliced by requested position,
 * with optional mid-stream connection drops. Used by `LiveWireSpec` and
 * `BinlogSpoolerSpec`.
 */
object MysqlTestStub {

  val Uuid: java.util.UUID = java.util.UUID.fromString("3e11fa47-71ca-11e1-9e33-c80aa9429562")

  def patchLogPos(e: Array[Byte], pos: Long): Array[Byte] = {
    val p = e.clone()
    p(13) = (pos & 0xff).toByte; p(14) = ((pos >> 8) & 0xff).toByte
    p(15) = ((pos >> 16) & 0xff).toByte; p(16) = ((pos >> 24) & 0xff).toByte
    p
  }
  def logPos(e: Array[Byte]): Long =
    (e(13) & 0xffL) | ((e(14) & 0xffL) << 8) | ((e(15) & 0xffL) << 16) | ((e(16) & 0xffL) << 24)
  def eventType(e: Array[Byte]): Int = e(4) & 0xff

  /** A realistic binlog event stream: FDE, then per row GTID + TABLE_MAP +
   * WRITE_ROWS (table map before every rows event, like real binlogs, so a
   * resume mid-stream always has its map). `xidPerRow` commits each row as
   * its own transaction; otherwise one XID closes the whole stream.
   * log_pos is patched to true byte offsets in the virtual file. */
  def binlogFile(pks: Seq[Long], xidPerRow: Boolean = false): IndexedSeq[Array[Byte]] = {
    val ts = 1700000000L
    val raw = IndexedSeq.newBuilder[Array[Byte]]
    raw += Fx.formatDescription(ts, 0)
    pks.foreach { pk =>
      raw += Fx.gtid(Uuid, pk + 1, ts, 0)
      raw += Fx.tableMap(Fx.OrdersTableId, Fx.OrdersDb, Fx.OrdersTable, Fx.ordersCols, ts, 0)
      raw += Fx.rowsEvent(B.WRITE_ROWS_V2, Fx.OrdersTableId, Fx.ordersCols,
        Seq(Seq(Fx.orderValues(pk, pk + 100, "O", 10.50 + pk, 812332800000L, "2-HIGH"))), ts, 0)
      if (xidPerRow) raw += Fx.xid(pk, ts, 0)
    }
    if (!xidPerRow) raw += Fx.xid(7L, ts, 0)
    var off = 4L // binlog files start with the 4-byte magic
    raw.result().map { e => off += e.length; patchLogPos(e, off) }
  }

  /** Minimal MySQL server; `dropAfterOnFirst` kills the first STREAMING
   * connection after N non-FDE events (the spooler's failover guard probes
   * `server_uuid` on its own connection first, which must not absorb the
   * injected fault). `serverUuid` is the identity the COM_QUERY probe
   * answers — flipping it mid-test IS the failover; None simulates a
   * pre-5.6 server where the variable is unavailable (ERR). */
  class Stub(password: String, events: IndexedSeq[Array[Byte]],
             dropAfterOnFirst: Int = Int.MaxValue) {
    import MysqlWire._
    val nonce: Array[Byte] = (1 to 20).map(_.toByte).toArray
    val dumps = new ConcurrentLinkedQueue[DumpRequest]()
    val queries = new ConcurrentLinkedQueue[String]()
    val serverUuid = new java.util.concurrent.atomic.AtomicReference[Option[String]](Some(Uuid.toString))
    val conns = new AtomicInteger(0)
    private val streamConns = new AtomicInteger(0)
    private val server = new ServerSocket(0)
    val port: Int = server.getLocalPort
    @volatile private var running = true
    private val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          new Thread(() => {
            try {
              conns.incrementAndGet()
              val in = new BufferedInputStream(sock.getInputStream)
              val out = new BufferedOutputStream(sock.getOutputStream)
              writePacket(out, 0, encodeGreeting("8.0.36-graft", 1L, nonce))
              val (_, respRaw) = readPacket(in)
              val resp = decodeHandshakeResponse(respRaw)
              val expected = nativePasswordScramble(password, nonce)
              if (!java.util.Arrays.equals(resp.scramble, expected)) {
                writePacket(out, 2, errPacket(1045, s"Access denied for user '${resp.user}'"))
              } else {
                writePacket(out, 2, okPacket())
                var open = true
                while (open) {
                  val (_, cmd) = readPacket(in)
                  (cmd(0) & 0xff) match {
                    case 0x03 => // COM_QUERY: the identity probe
                      val sql = decodeComQuery(cmd)
                      queries.add(sql)
                      var seq = 1
                      serverUuid.get() match {
                        case Some(uuid) if sql.contains("server_uuid") =>
                          textResultSet("@@global.server_uuid", Seq(Some(uuid)))
                            .foreach { p => seq = writePacket(out, seq, p) }
                        case _ =>
                          seq = writePacket(out, seq,
                            errPacket(1193, "Unknown system variable 'server_uuid'"))
                      }
                    case 0x1e => // COM_BINLOG_DUMP_GTID
                      val n = streamConns.incrementAndGet()
                      val req = decodeBinlogDumpGtid(cmd)
                      dumps.add(req)
                      var seq = 1
                      var sent = 0
                      val serve = events.filter(e =>
                        eventType(e) == B.FORMAT_DESCRIPTION_EVENT || logPos(e) > req.pos)
                      serve.foreach { e =>
                        if (n == 1 && sent >= dropAfterOnFirst) throw new java.io.IOException("injected drop")
                        writePacket(out, seq, 0x00.toByte +: e)
                        seq += 1
                        if (eventType(e) != B.FORMAT_DESCRIPTION_EVENT) sent += 1
                      }
                      // EOF packet: 0xfe with short payload
                      writePacket(out, seq, Array(0xfe.toByte, 0, 0, 0, 0))
                      open = false
                    case _ => open = false // COM_QUIT / unknown
                  }
                }
              }
            } catch { case _: java.io.IOException => () }
            finally sock.close()
          }).start()
        } catch { case _: java.io.IOException => () }
      }
    })
    acceptor.setDaemon(true)
    acceptor.start()
    def stop(): Unit = { running = false; server.close() }
  }
}
