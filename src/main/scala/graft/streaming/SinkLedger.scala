package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/**
 * Per-sink commit ledger — the replay/commit bookkeeping the reference keeps
 * as `{source}::sink::{id}` checkpoints (crates/runner/src/coordinator.rs:
 * 1062-1157, proxy pipeline_manager.rs:31-70).
 *
 * Spark already checkpoints *source* offsets; this ledger adds the per-sink
 * high-water mark so that (a) a replayed micro-batch is skipped by sinks that
 * already committed it (idempotent at-least-once → effectively-once), and
 * (b) `minCommitted` tells an operator how far ALL sinks have durably
 * advanced (the reference's min-replay resume point).
 *
 * Driver-side, tiny (one line per sink), atomic via write-temp+rename. At
 * scale this is a metadata table (Delta/JDBC), not a data-plane structure.
 */
class SinkLedger(dir: String) extends Serializable {
  private def file = Paths.get(dir, "ledger.tsv")

  private def read(): Map[String, Long] = {
    if (!Files.exists(file)) Map.empty
    else Files.readAllLines(file).asScala.filter(_.nonEmpty).map { l =>
      val Array(k, v) = l.split("\t"); k -> v.toLong
    }.toMap
  }

  def committed(sinkId: String): Long = read().getOrElse(sinkId, -1L)

  def commit(sinkId: String, batchId: Long): Unit = synchronized {
    val m = read() + (sinkId -> math.max(batchId, committed(sinkId)))
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(dir, s".ledger.tmp")
    Files.write(tmp, m.toSeq.sorted.map { case (k, v) => s"$k\t$v" }.mkString("\n").getBytes)
    Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** min over registered sinks = safe global resume point (reference C-5). */
  def minCommitted(sinkIds: Seq[String]): Long =
    if (sinkIds.isEmpty) -1L else sinkIds.map(committed).min
}
