package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamingDedup._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files
import java.sql.Timestamp

/** Ingest-time dedup: exact watermarked drop + stateful banded-MinHash
 * near-dup candidates (state bounded per bucket, canonicals persist across
 * micro-batches). */
class StreamingDedupSpec extends SparkSpec {

  private val base =
    "the quick brown fox jumps over the lazy dog near the river bank today ok"
  private val near =
    "the quick brown fox jumps over the lazy dog near the river bank tonight ok"
  private val other =
    "completely different content about spark shuffle partitions and joins here now"

  // ——— pure per-bucket update step ———

  private def sig(parts: Long*): Array[Long] = parts.toArray

  test("updateBucket: match emits best candidate, tie goes to earliest canonical") {
    val s0 = Some(BucketState(Array(1L, 2L), Array(sig(10, 20, 30, 40), sig(10, 20, 30, 99))))
    // incoming agrees with BOTH stored sigs on 3/4 — tie → canonical 1
    val (emits, s1) = updateBucket(s0, Seq((5L, sig(10, 20, 30, 77))), 0.7, 8, band = 3)
    assert(emits == Seq(DupCandidate(5L, 1L, 0.75, 3)))
    // the duplicate is NOT stored — canonical set unchanged
    assert(s1.get.ids.toSeq == Seq(1L, 2L))
  }

  test("updateBucket: non-match joins the buffer; overflow evicts the oldest") {
    var st: Option[BucketState] = None
    for (id <- 1L to 4L) {
      val (emits, s) = updateBucket(st, Seq((id, sig(id, id + 100, id + 200, id + 300))),
        0.7, maxPerBucket = 3, band = 0)
      assert(emits.isEmpty)
      st = s
    }
    // 4 distinct docs through a cap-3 buffer → oldest (1) evicted
    assert(st.get.ids.toSeq == Seq(2L, 3L, 4L))
  }

  test("updateBucket: within-batch ordering is by docId, duplicates match the earlier doc") {
    val in = Seq((9L, sig(1, 2, 3, 4)), (7L, sig(1, 2, 3, 4))) // same sig, out of order
    val (emits, st) = updateBucket(None, in, 0.9, 8, band = 1)
    // 7 processed first (stored), 9 flagged against 7
    assert(emits == Seq(DupCandidate(9L, 7L, 1.0, 1)))
    assert(st.get.ids.toSeq == Seq(7L))
  }

  test("foldBucket streams a 100×-cap hot bucket without materializing the group") {
    // the r10 verdict's hot-bucket term: a mass-duplicated bucket must
    // cost O(maxPerBucket), never O(group). Feed 100× the cap through the
    // lazy fold and assert (a) it emits while the input is still being
    // pulled (no upfront .toSeq), (b) state stays at one canonical.
    val cap = 8
    val n = 100 * cap
    var pulled = 0
    val dupSig = sig(1, 2, 3, 4)
    val incoming = Iterator.tabulate(n) { i => pulled += 1; (i.toLong, dupSig) }
    var fin: Option[BucketState] = None
    val out = foldBucket(None, incoming, 0.9, cap, band = 0)(fin = _)
    val first = out.next() // one pull chain: doc 0 stored, doc 1 flagged
    assert(first == DupCandidate(1L, 0L, 1.0, 0))
    assert(pulled <= 3, s"fold materialized the group: pulled $pulled of $n upfront")
    val rest = out.toList
    assert(rest.size == n - 2) // every later doc flags against canonical 0
    assert(rest.forall(c => c.dupOf == 0L && c.estJaccard == 1.0))
    assert(fin.get.ids.toSeq == Seq(0L)) // state: ONE canonical, not the flood
  }

  test("replayedCandidates: mass-duplicated corpus stays bounded and exact") {
    import spark.implicits._
    val n = 400
    val corpus = (0L until n).map(i => (i, base)) // every doc identical
    val pairs = StreamingDedup
      .replayedCandidates(corpus.toDF("doc_id", "text"),
        k = 64, bands = 16, threshold = 0.6, maxPerBucket = 4)
      .collect().map(c => (c.docId, c.dupOf)).toSet
    // each doc i>0 flags against canonical 0 (in every band — pair set dedups)
    assert(pairs == (1L until n).map(i => (i, 0L)).toSet)
  }

  // ——— streaming e2e ———

  test("near-dup candidates surface across micro-batches; state persists") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val dir = Files.createTempDirectory("sdedup").toString
    val cands = nearDupCandidates(ms.toDF().toDF("doc_id", "text"),
      k = 64, bands = 16, threshold = 0.6, stateTimeoutMs = 0)
    val q = cands.writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/chk")
      .format("memory").queryName("sdedup_cands")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    ms.addData((0L, base), (2L, other))
    q.processAllAvailable()
    assert(spark.table("sdedup_cands").isEmpty) // nothing similar yet
    ms.addData((5L, near), (6L, other)) // near-dup of 0; exact dup of 2 — LATER batch
    q.processAllAvailable()
    val rows = spark.table("sdedup_cands")
      .collect().map(r => (r.getAs[Long]("docId"), r.getAs[Long]("dupOf")))
    q.stop()
    // candidates may emit from several bands — the PAIR set is what matters
    assert(rows.toSet == Set((5L, 0L), (6L, 2L)),
      s"unexpected candidate pairs: ${rows.toSeq}")
  }

  test("near-dup state survives a query restart from the checkpoint") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val dir = Files.createTempDirectory("sdedup_rs").toString
    // the memory sink refuses checkpoint recovery — use a parquet sink
    def start() = nearDupCandidates(ms.toDF().toDF("doc_id", "text"),
      k = 64, bands = 16, threshold = 0.6, stateTimeoutMs = 0)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/chk")
      .format("parquet").option("path", s"$dir/out")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()

    val q1 = start()
    ms.addData((0L, base), (2L, other))
    q1.processAllAvailable()
    q1.stop()

    val q2 = start() // NEW query, same checkpoint — state must restore
    ms.addData((9L, near)) // near-dup of doc 0, seen only BEFORE the restart
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(s"$dir/out")
      .collect().map(r => (r.getAs[Long]("docId"), r.getAs[Long]("dupOf"))).toSet
    assert(rows == Set((9L, 0L)), s"state lost across restart: $rows")
  }

  test("exact streaming dedup drops watermark-window repeats") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, String)]
    val dir = Files.createTempDirectory("sdexact").toString
    val out = exactDeduped(ms.toDF().toDF("ts", "doc_id", "text"))
    val q = out.writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/chk")
      .format("memory").queryName("sdedup_exact")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    ms.addData((t(0), 1L, base), (t(1), 2L, other))
    q.processAllAvailable()
    ms.addData((t(2), 3L, base)) // exact repeat inside the watermark — dropped
    q.processAllAvailable()
    val ids = spark.table("sdedup_exact").collect().map(_.getAs[Long]("doc_id")).sorted
    q.stop()
    assert(ids.toSeq == Seq(1L, 2L))
  }

  test("batch replay fold == live micro-batch replay (dedup_streaming_parity contract)") {
    // The oracle-checked dedup_streaming_parity query runs the per-bucket
    // fold ONCE over docId-ordered input (replayedCandidates); this pins
    // that a REAL flatMapGroupsWithState query fed the same corpus in
    // docId-ordered micro-batches emits the identical candidate set —
    // updateBucket is a left fold, so batch splits cannot change it.
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val corpus: Seq[(Long, String)] = Seq(
      0L -> base, 1L -> other, 2L -> near,
      3L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
      4L -> base, // exact repeat of 0
      5L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu",
      6L -> "totally unrelated text about clickhouse rowbinary encodings and sinks",
      7L -> near) // near-dup of 0/2/4
    val batchPairs = StreamingDedup
      .replayedCandidates(corpus.toDF("doc_id", "text"),
        k = 64, bands = 16, threshold = 0.6)
      .collect().map(c => (c.docId, c.dupOf)).toSet

    val ms = MemoryStream[(Long, String)]
    val dir = Files.createTempDirectory("sdedup_parity").toString
    val q = nearDupCandidates(ms.toDF().toDF("doc_id", "text"),
      k = 64, bands = 16, threshold = 0.6, stateTimeoutMs = 0)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/chk")
      .format("memory").queryName("sdedup_parity")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    corpus.sortBy(_._1).grouped(3).foreach { b => // docId-ordered micro-batches
      ms.addData(b: _*)
      q.processAllAvailable()
    }
    val streamPairs = spark.table("sdedup_parity")
      .collect().map(r => (r.getAs[Long]("docId"), r.getAs[Long]("dupOf"))).toSet
    q.stop()
    assert(streamPairs == batchPairs,
      s"fold/micro-batch divergence: stream=$streamPairs batch=$batchPairs")
    assert(batchPairs.nonEmpty) // the corpus plants real near-dups
  }
}
