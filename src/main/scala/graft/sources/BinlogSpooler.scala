package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}

/**
 * Live tail → backlog bridge: drives [[MysqlWire.BinlogClient]] and spools
 * received binlog events into [[BacklogSource]] segment files (`.segb64`),
 * so the DSv2 streaming source — offsets, admission control, checkpoint
 * resume, the purge guard — tails a LIVE SOCKET. This is the reference's
 * source loop (crates/sources/src/mysql/mod.rs:63-114: connect, stream,
 * checkpoint, reconnect with backoff) composed with the existing
 * file-offset machinery instead of re-implementing it: the spool is the
 * durable replay buffer (the role Kafka plays in a Debezium deployment).
 *
 * Transaction-safe segmentation: events buffer until an XID (commit)
 * event closes a transaction AND the segment budget is reached — a
 * segment never splits a transaction or separates a TABLE_MAP from its
 * ROWS events. Every segment is prefixed with the last-seen
 * FORMAT_DESCRIPTION event so each decodes self-contained. On a dropped
 * connection the uncommitted tail buffer is DISCARDED, not spooled — the
 * reconnect re-fetches it from the checkpointed position, so spooled
 * segments contain every transaction exactly once, whole.
 */
class BinlogSpooler(
    host: String, port: Int, user: String, password: String,
    dir: String, binlogFile: String, startPos: Long = 4L,
    maxEventsPerSegment: Int = 1000,
    serverId: Long = 101L) {

  private val XID_EVENT = 16
  private val statePath = Paths.get(dir, "_spool_checkpoint")
  private val identityPath = Paths.get(dir, "_spool_identity")
  Files.createDirectories(Paths.get(dir))

  /** Spooled-through position: resume point for reconnects. */
  def checkpoint(): Long =
    if (Files.exists(statePath)) new String(Files.readAllBytes(statePath), UTF_8).trim.toLong
    else startPos

  /** The `server_uuid` this spool's position belongs to (first identity
   * probe), or None before the first successful connect. */
  def identity(): Option[String] =
    if (Files.exists(identityPath))
      Some(new String(Files.readAllBytes(identityPath), UTF_8).trim)
    else None

  /**
   * Failover guard (reference chaos failover.rs steps 5-7 +
   * mysql_health.rs:317-337 `fetch_server_identity`): every connection
   * probes `@@global.server_uuid` before streaming; a different UUID means
   * the server was REPLACED (primary promotion) — the checkpointed binlog
   * file/position names the OLD server's binlog history and is meaningless
   * on the new one. With a consumed checkpoint this throws
   * [[BinlogSpooler.FailoverException]] (non-retryable); on a clean spool
   * the new identity is adopted. A server that cannot answer (pre-5.6, or
   * the variable unset) yields None — "cannot detect failover", fall
   * through to position validation only (the reference's `Ok(None)` path).
   */
  private def checkIdentity(client: MysqlWire.BinlogClient): Unit =
    client.queryScalar("SELECT @@global.server_uuid").foreach { uuid =>
      identity() match {
        case Some(saved) if saved != uuid && checkpoint() > startPos =>
          throw new BinlogSpooler.FailoverException(saved, uuid, binlogFile, checkpoint())
        case Some(saved) if saved == uuid => ()
        case _ =>
          val tmp = Paths.get(dir, "_spool_identity.tmp")
          Files.write(tmp, uuid.getBytes(UTF_8))
          Files.move(tmp, identityPath, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
      }
    }

  private def commitCheckpoint(pos: Long): Unit = {
    val tmp = Paths.get(dir, "_spool_checkpoint.tmp")
    Files.write(tmp, pos.toString.getBytes(UTF_8))
    Files.move(tmp, statePath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private var fde: Array[Byte] = Array.emptyByteArray
  private val buffer = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
  private var committedLen = 0 // buffer prefix closed by an XID — only this flushes
  private var bufferedEvents = 0
  private var safePos = -1L // end position of the last committed tx in buffer

  private def flushSegment(): Unit = if (committedLen > 0 && safePos > 0) {
    val body = new java.io.ByteArrayOutputStream()
    if (fde.nonEmpty) body.write(fde)
    // ONLY the committed prefix — events of an open transaction past the
    // last XID must never spool (they re-arrive whole after the reconnect)
    buffer.take(committedLen).foreach(body.write)
    val name = f"seg-$safePos%012d.segb64"
    val tmp = Paths.get(dir, s"$name.tmp")
    Files.write(tmp, java.util.Base64.getEncoder.encodeToString(body.toByteArray).getBytes(UTF_8))
    // REPLACE: a crash between segment write and checkpoint commit makes
    // the restart re-spool the same tx range under the same name — the
    // content is byte-identical, so overwrite instead of failing
    Files.move(tmp, Paths.get(dir, name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    buffer.remove(0, committedLen)
    committedLen = 0
    bufferedEvents = buffer.length
    commitCheckpoint(safePos)
    safePos = -1L
  }

  /**
   * One connection attempt: tail from the checkpoint, spool tx-whole
   * segments, flush the closed tail on clean EOF. IOException (dropped
   * connection) propagates after discarding the uncommitted tail.
   */
  def runOnce(): Unit = {
    val client = new MysqlWire.BinlogClient(host, port, user, password, serverId)
    checkIdentity(client) // failover guard BEFORE streaming from a checkpoint
    try {
      client.tail(binlogFile, checkpoint()) { (e, endPos) =>
        val typ = e(4) & 0xff
        if (typ == MysqlBinlog.FORMAT_DESCRIPTION_EVENT) fde = e
        else {
          buffer += e
          bufferedEvents += 1
          if (typ == XID_EVENT) {
            safePos = endPos // tx closed — segment may cut here
            committedLen = buffer.length
            if (bufferedEvents >= maxEventsPerSegment) flushSegment()
          }
        }
        true
      }
      flushSegment() // clean EOF: spool the closed tail
    } catch {
      case e: java.io.IOException =>
        // drop mid-tx: spool nothing past the last commit; the reconnect
        // re-fetches the discarded tail from the checkpoint
        flushSegment()
        buffer.clear(); committedLen = 0; bufferedEvents = 0
        throw e
    }
  }

  /**
   * Pump with reconnect-backoff until a clean end of stream (the stub's
   * EOF; a real server stream is endless — run on a maintenance thread).
   * Returns the number of connection attempts.
   */
  def pump(maxAttempts: Int = 5, backoffMs: Long = 50L): Int = {
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      try { runOnce(); done = true }
      catch {
        case e: java.io.IOException =>
          if (attempts >= maxAttempts) throw e
          Thread.sleep(backoffMs * attempts)
      }
    }
    attempts
  }
}

object BinlogSpooler {

  /**
   * The server answering this spool's reconnect is NOT the server the
   * checkpoint was consumed from (reference chaos failover.rs: UUID change
   * detected post-reconnect → reconciliation → position Lost → halt).
   * Deliberately not an IOException: reconnect loops must not retry it.
   */
  class FailoverException(val savedUuid: String, val newUuid: String,
                          val binlogFile: String, val checkpointPos: Long)
      extends IllegalStateException(
        s"mysql server_uuid changed $savedUuid → $newUuid but checkpoint " +
          s"$binlogFile:$checkpointPos was consumed from the old server — the " +
          "saved position names the old primary's binlog history; halt for " +
          "operator intervention or re-snapshot (never silently resume)")
}
