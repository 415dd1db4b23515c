package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Custom keyed state on a stream: gap-based sessionization with
 * `flatMapGroupsWithState` — the Structured Streaming surface for state the
 * built-in window/dedup operators can't express (SURVEY §7 mapping of the
 * reference's per-key processor state).
 *
 * Semantics: events for a user belong to one session while gaps stay under
 * `gapMs`; a session is EMITTED when a new event arrives after the gap, or
 * when the state times out (processing-time timeout ≈ watermark close).
 * State per key is O(1) (count + bounds) — no event buffering — so state
 * size at 100 TB is #active-keys, not #events, and the state store
 * (RocksDB in production) handles eviction via the timeout.
 */
object StatefulSessionize {

  case class Event(userId: Long, tsMs: Long)
  case class SessionState(start: Long, end: Long, n: Long)
  case class Session(userId: Long, startMs: Long, endMs: Long, nEvents: Long)

  /**
   * The pure per-user update step: fold ts-sorted events into the open
   * session, closing (emitting) whenever the gap is crossed. A LEFT FOLD —
   * so feeding a user's history in one call produces exactly what any
   * ts-ordered micro-batch sequence produces (split-invariance; the same
   * argument that makes [[StreamingDedup.replayedCandidates]]
   * oracle-checkable). Returns (closed sessions in order, open state).
   */
  def foldEvents(state: Option[SessionState], sorted: Seq[Event], gapMs: Long)
      : (List[Session], Option[SessionState]) = {
    var closed = List.empty[Session]
    var cur = state
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.tsMs - s.end <= gapMs =>
          cur = Some(s.copy(end = e.tsMs, n = s.n + 1))
        case Some(s) =>
          closed ::= Session(e.userId, s.start, s.end, s.n)
          cur = Some(SessionState(e.tsMs, e.tsMs, 1))
        case None =>
          cur = Some(SessionState(e.tsMs, e.tsMs, 1))
      }
    }
    (closed.reverse, cur)
  }

  /**
   * Batch-parity replay of the streaming sessionizer: each user's complete
   * ts-ordered history through the SAME fold in one distributed pass,
   * emitting closed sessions plus the final still-open one (streaming
   * emits it at timeout/stream-end). One shuffle on the user key; the
   * ts ordering comes from a SECONDARY SORT (`sortWithinPartitions(userId,
   * tsMs)` — external, spillable) and the partition then streams through
   * [[foldEvents]] ONE EVENT AT A TIME (a left fold applied per element is
   * the same fold), so even a degenerate bot user with millions of events
   * costs O(1) task memory, never O(group). This is what pins the
   * stateful operator to a SQL-expressible oracle.
   */
  def replayedSessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .repartition(org.apache.spark.sql.functions.col("userId"))
      .sortWithinPartitions("userId", "tsMs")
      .mapPartitions { rows =>
        new Iterator[Session] {
          private var pending: List[Session] = Nil
          private var cur: Option[SessionState] = None
          private var curUser = 0L
          private def flushOpen(): Unit = {
            pending = cur.map(s => Session(curUser, s.start, s.end, s.n)).toList
            cur = None
          }
          private def advance(): Unit =
            while (pending.isEmpty && (rows.hasNext || cur.isDefined)) {
              if (!rows.hasNext) flushOpen()
              else {
                val e = rows.next()
                if (cur.isDefined && e.userId != curUser) flushOpen()
                val (closed, next) = foldEvents(cur, Seq(e), gapMs)
                pending = closed ++ pending
                cur = next
                curUser = e.userId
              }
            }
          def hasNext: Boolean = { advance(); pending.nonEmpty }
          def next(): Session = {
            advance(); val s = pending.head; pending = pending.tail; s
          }
        }
      }
  }

  /**
   * `stateTimeoutMs > 0` enables processing-time timeouts that flush idle
   * sessions (production mode — note the engine then runs timeout batches
   * continuously, so tests that wait for quiescence should pass 0 = NoTimeout
   * and rely on gap-crossing emission).
   */
  def sessionize(events: Dataset[Event], gapMs: Long, stateTimeoutMs: Long = 60000L): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (stateTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeoutConf) {
        case (userId, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s => Session(userId, s.start, s.end, s.n))
            state.remove()
            out.iterator
          } else {
            // shared pure fold — identical semantics to the batch replay
            val (closed, cur) = foldEvents(state.getOption, evs.toSeq.sortBy(_.tsMs), gapMs)
            cur.foreach(state.update)
            if (stateTimeoutMs > 0) state.setTimeoutDuration(stateTimeoutMs)
            closed.iterator
          }
      }
  }
}
