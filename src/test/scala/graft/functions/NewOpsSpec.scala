package graft.functions

import graft.SparkSpec
import graft.streaming.StatefulSessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

class NewOpsSpec extends SparkSpec {

  test("fused shingle+hash equals sorted-distinct xxhash64 of text_ngrams, bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a",                       // repeated tokens → duplicate shingles
      "  leading   and    multi  spaces ",
      "two tokens",                      // fewer than n tokens → empty
      "exactly three tokens",            // exactly n tokens → one shingle
      "",                                // empty text
      "unicode é 漢字 😀 mixed tokens here",
      "x " * 500 + "tail")               // long doc, dup-heavy
    val df = texts.toDF("text")
    val rows = df.select(
      TextHashOps.textNgramsXxh64Sorted(col("text"), 3).as("fused"),
      TextHashOps.sortedDistinct(
        TextHashOps.xxhash64Array(TextHashOps.textNgrams(col("text"), 3))).as("composed"))
      .collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"diverged for <$t>")
    }
    // intersect-count agrees with array_intersect set semantics
    val a = df.select(TextHashOps.textNgramsXxh64Sorted(col("text"), 3).as("h")).collect()
    val pairs = for (x <- a; y <- a) yield (x.getSeq[Long](0), y.getSeq[Long](0))
    pairs.foreach { case (x, y) =>
      val expected = x.toSet.intersect(y.toSet).size
      val dfp = Seq((x, y)).toDF("a", "b")
      val got = dfp.select(TextHashOps.sortedIntersectCount(col("a"), col("b"))).collect()(0).getInt(0)
      assert(got == expected, s"intersect count diverged: $got vs $expected")
    }
  }

  test("positional fused gram hashes + token count equal composed forms, bit-for-bit (r15)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a",                       // duplicates MUST be kept, in order
      "  leading   and    multi  spaces ",
      "two tokens",
      "",
      "unicode é 漢字 😀 mixed tokens here",
      "x " * 500 + "tail")
    val df = texts.toDF("text")
    for (n <- Seq(1, 3, 16)) {
      val rows = df.select(
        TextHashOps.textNgramsXxh64All(col("text"), n).as("fused"),
        TextHashOps.xxhash64Array(TextHashOps.textNgramsAll(col("text"), n)).as("composed"))
        .collect()
      rows.zip(texts).foreach { case (r, t) =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"diverged for <$t> n=$n")
      }
    }
    val tc = df.select(
      TextHashOps.tokenCount(col("text")).as("fused"),
      size(TextHashOps.textNgramsAll(col("text"), 1)).as("composed")).collect()
    tc.zip(texts).foreach { case (r, t) =>
      assert(r.getInt(0) == r.getInt(1), s"token count diverged for <$t>")
    }
  }

  test("band_hashes equals composed xxhash64(slice(sig), band) chain, bit-for-bit") {
    import spark.implicits._
    // real-ish signatures: random long arrays of the suite's k=64, plus the
    // r=4 (bands=16) streaming shape — the fused walk must reproduce
    // xxhash64's fold (seed 42 over slice elements, then the band literal)
    val rnd = new scala.util.Random(7)
    val sigs = Seq.fill(50)(Seq.fill(64)(rnd.nextLong()))
    val df = sigs.toDF("sig")
    for (bands <- Seq(32, 16)) {
      val r = 64 / bands
      val rows = df.select(
        TextHashOps.bandHashes(col("sig"), bands).as("fused"),
        array((0 until bands).map { b =>
          xxhash64(slice(col("sig"), b * r + 1, r), lit(b))
        }: _*).as("composed")).collect()
      rows.foreach { row =>
        assert(row.getSeq[Long](0) == row.getSeq[Long](1), s"diverged at bands=$bands")
      }
    }
    // minhash signature: the Mersenne-folded (a·x+b) mod P must equal the
    // floorMod formula — pin against a direct Scala recomputation
    val featRows = Seq.fill(20)(Seq.fill(30)(rnd.nextLong()))
    val P = TextHashOps.MinHashSignature.P
    val as = Array.tabulate(8)(i => TextHashOps.coef(i, 0xA5A5L))
    val bs = Array.tabulate(8)(i => TextHashOps.coef(i, 0x5A5AL))
    val got = featRows.toDF("f")
      .select(TextHashOps.minhashSignature(col("f"), 8)).collect()
    featRows.zip(got).foreach { case (feats, row) =>
      val expected = (0 until 8).map { j =>
        feats.map(t => java.lang.Math.floorMod(
          as(j) * java.lang.Math.floorMod(t, P) + bs(j), P)).min
      }
      assert(row.getSeq[Long](0) == expected, "minhash diverged from floorMod formula")
    }
  }

  test("uuidv7: version/variant bits, embedded timestamp, time-ordering (lib.rs:980-1023)") {
    import spark.implicits._
    val before = System.currentTimeMillis()
    val ids = spark.range(100).select(Uuidv7.withSeed(42L).as("id")).as[String].collect()
    val after = System.currentTimeMillis()
    assert(ids.distinct.length == 100)
    ids.foreach { id =>
      val u = java.util.UUID.fromString(id)
      assert(u.version() == 7)
      assert(u.variant() == 2) // RFC 4122
      val ts = Uuidv7.timestampMillis(id)
      assert(ts >= before && ts <= after)
    }
  }

  test("dynamic JSON flatten: nested keys, fidelity, max_depth, list index, empty policies") {
    import spark.implicits._
    import JsonFlatten._
    val json = """{"user":{"address":{"city":"x","geo":{"lat":1.50}},"tags":["a","b"]},
                 |"empty_obj":{},"empty_list":[],"n":5,"big":12345678901234567890.25}""".stripMargin
    def run(c: org.apache.spark.sql.Column): String =
      Seq(json).toDF("j").select(c.as("v")).head().getString(0)

    val full = run(flattenJson(col("j")))
    assert(full.contains(""""user__address__city":"x""""))
    assert(full.contains(""""user__address__geo__lat":1.5"""))
    // the fidelity check: a 21-digit decimal no double could represent survives
    assert(full.contains(""""big":12345678901234567890.25"""))
    assert(full.contains(""""user__tags":["a","b"]""")) // lists preserved by default
    assert(full.contains(""""empty_obj":{}"""))

    val depth2 = run(flattenJson(col("j"), maxDepth = 2))
    assert(depth2.contains(""""user__address":{"""))
    assert(!depth2.contains("user__address__city"))

    val indexed = run(flattenJson(col("j"), indexLists = true))
    assert(indexed.contains(""""user__tags__0":"a"""") && indexed.contains(""""user__tags__1":"b""""))

    val dropped = run(flattenJson(col("j"), emptyPolicy = EmptyDrop))
    assert(!dropped.contains("empty_obj") && !dropped.contains("empty_list"))
    val nulled = run(flattenJson(col("j"), emptyPolicy = EmptyNull))
    assert(nulled.contains(""""empty_obj":null"""))
  }

  test("flatMapGroupsWithState sessionization: gap splits sessions, O(1) state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[StatefulSessionize.Event]
    val dir = Files.createTempDirectory("fmgws").toString
    val sessions = StatefulSessionize.sessionize(ms.toDS(), gapMs = 60000L, stateTimeoutMs = 0L)
    val q = sessions.writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/chk")
      .format("memory").queryName("sessions_out")
      .trigger(Trigger.ProcessingTime("200 milliseconds")).start()
    val t0 = 1700000000000L
    // user 1: two events close together, then a 10-minute gap, then one more
    ms.addData(StatefulSessionize.Event(1L, t0), StatefulSessionize.Event(1L, t0 + 30000))
    q.processAllAvailable()
    ms.addData(StatefulSessionize.Event(1L, t0 + 630000))
    q.processAllAvailable()
    val closed = spark.table("sessions_out").as[StatefulSessionize.Session].collect()
    q.stop()
    // the first session (2 events, 30s span) closed when the gap was crossed
    assert(closed.length == 1)
    assert(closed.head.nEvents == 2 && closed.head.startMs == t0 && closed.head.endMs == t0 + 30000)
  }

  test("batch session replay == streaming micro-batch replay + open state (parity contract)") {
    // pins events_streaming_sessions' premise: foldEvents is a left fold,
    // so the one-pass batch replay equals a live flatMapGroupsWithState
    // query fed the same events in ts-ordered micro-batches (closed
    // sessions) plus the per-user still-open state at stream end
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val t0 = 1700000000000L
    val evs = Seq( // 2 users, gaps crossing and not
      StatefulSessionize.Event(1L, t0), StatefulSessionize.Event(1L, t0 + 30000),
      StatefulSessionize.Event(2L, t0 + 10000),
      StatefulSessionize.Event(1L, t0 + 630000), // 10-min gap: closes u1 s1
      StatefulSessionize.Event(2L, t0 + 40000),
      StatefulSessionize.Event(1L, t0 + 640000),
      StatefulSessionize.Event(2L, t0 + 800000)) // closes u2 s1
    val batch = StatefulSessionize.replayedSessions(evs.toDS(), gapMs = 60000L)
      .collect().map(s => (s.userId, s.startMs, s.endMs, s.nEvents)).toSet

    val ms = MemoryStream[StatefulSessionize.Event]
    val dir = Files.createTempDirectory("fmgws_parity").toString
    val q = StatefulSessionize.sessionize(ms.toDS(), gapMs = 60000L, stateTimeoutMs = 0L)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/chk")
      .format("memory").queryName("sessions_parity")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    evs.sortBy(_.tsMs).grouped(3).foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    val closedS = spark.table("sessions_parity").as[StatefulSessionize.Session]
      .collect().map(s => (s.userId, s.startMs, s.endMs, s.nEvents)).toSet
    q.stop()
    // streaming emitted the CLOSED sessions; the final open session per
    // user is exactly the batch replay's remainder
    val open = Seq((1L, t0 + 630000, t0 + 640000, 2L), (2L, t0 + 800000, t0 + 800000, 1L)).toSet
    assert(closedS == batch -- open, s"closed mismatch: $closedS vs ${batch -- open}")
    assert(batch == closedS ++ open)
  }
}
