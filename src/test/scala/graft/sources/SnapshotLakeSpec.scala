package graft.sources

import graft.SparkSpec
import graft.core.ChangeEvent
import graft.operators.LakeProjection
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

class SnapshotLakeSpec extends SparkSpec {

  test("lake projection: flat before_/after_ typed columns from JSON images") {
    import spark.implicits._
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val ev = ChangeEvent.conform(
      Seq(
        ("c", null, """{"id":1,"v":"a"}"""),
        ("u", """{"id":2,"v":"old"}""", """{"id":2,"v":"new"}"""),
        ("d", """{"id":3,"v":"gone"}""", null))
        .toDF("op", "before", "after")
        .withColumn("source", struct(lit("db").as("db"), lit("t").as("table")))
        .withColumn("event_id", col("op")))
    val flat = LakeProjection(ev, schema).orderBy(coalesce(col("after_id"), col("before_id")))
    val rows = flat.collect()
    assert(flat.columns.toSeq.containsSlice(Seq("op", "op_ts", "source_db")))
    assert(rows(0).getAs[Long]("after_id") == 1L && rows(0).isNullAt(rows(0).fieldIndex("before_id")))
    assert(rows(1).getAs[String]("before_v") == "old" && rows(1).getAs[String]("after_v") == "new")
    assert(rows(2).isNullAt(rows(2).fieldIndex("after_id")) && rows(2).getAs[String]("before_v") == "gone")
  }

  test("binary payload field decodes from _base64 wrapper (encoder.rs:1-19)") {
    import spark.implicits._
    val b64 = java.util.Base64.getEncoder.encodeToString("hello".getBytes)
    val df = Seq(s"""{"blob":{"_base64":"$b64"}}""").toDF("after")
    val out = df.select(LakeProjection.binaryField(col("after"), "blob").as("b")).head()
    assert(new String(out.getAs[Array[Byte]]("b")) == "hello")
  }

  test("snapshot chunk-count policy") {
    assert(SnapshotSupport.chunkCount(0) == 1)
    assert(SnapshotSupport.chunkCount(499999) == 1)
    assert(SnapshotSupport.chunkCount(500001) == 2)
    assert(SnapshotSupport.chunkCount(Long.MaxValue / 2) == 4096) // capped
  }

  test("ctid page ranges tile the heap with an OPEN tail: no gap, no overlap, no stale-estimate loss") {
    import SnapshotSupport._
    val preds = ctidPredicates(totalPages = 10, pagesPerChunk = 3)
    assert(preds.length == 4)
    assert(preds(0) == "ctid >= '(0,1)'::tid AND ctid < '(3,1)'::tid")
    // the LAST chunk is open-ended: relpages is an estimate, and rows on
    // pages appended after ANALYZE must still land in exactly one chunk
    assert(preds(3) == "ctid >= '(9,1)'::tid")
    // adjacent bounded chunks share the boundary tid exclusive/inclusive
    val bounded = preds.init.map { p =>
      val m = """'\((\d+),1\)'::tid AND ctid < '\((\d+),1\)'::tid""".r
        .findFirstMatchIn(p).get
      (m.group(1).toLong, m.group(2).toLong)
    }
    bounded.sliding(2).foreach { case Array((_, e), (s, _)) => assert(e == s); case _ => }
    assert(bounded.head._1 == 0L && bounded.last._2 == 9L)
    // never-analyzed table (relpages=0): ONE full-heap chunk, NOT an empty
    // snapshot — the regression the open tail exists to prevent
    assert(ctidPredicates(0, 3).toSeq == Seq("ctid >= '(0,1)'::tid"))
    assert(ctidPredicates(2, 100).toSeq == Seq("ctid >= '(0,1)'::tid")) // tiny → single open chunk
  }

  test("ctid pages-per-chunk policy targets ~chunk_size rows (ref :626)") {
    import SnapshotSupport._
    assert(ctidPagesPerChunk(500000, 100) == 5000)
    assert(ctidPagesPerChunk(50, 100) == 1) // never zero
    assert(ctidPagesPerChunk(1000, 0) == 1000) // degenerate estimate guarded
  }

  test("chunk strategy: single integer PK → range; composite or missing → ctid") {
    import SnapshotSupport._
    val intCols = Set("id", "seq")
    assert(chunkStrategy(Seq("id"), intCols) == ByPk("id"))
    assert(chunkStrategy(Seq("uuid"), intCols) == ByCtid) // non-integer PK
    assert(chunkStrategy(Seq("id", "region"), intCols) == ByCtid) // composite
    assert(chunkStrategy(Nil, intCols) == ByCtid) // PK-less
  }

  test("snapshot resume ledger skips completed tables") {
    val dir = Files.createTempDirectory("snap").toString
    val ledger = new SnapshotSupport.SnapshotLedger(dir)
    assert(ledger.pending(Seq("a", "b", "c")) == Seq("a", "b", "c"))
    ledger.markDone("b")
    assert(ledger.pending(Seq("a", "b", "c")) == Seq("a", "c"))
    assert(new SnapshotSupport.SnapshotLedger(dir).isDone("b")) // durable
  }

  test("reachability guard: purged position → Adapt resnapshots, Halt halts") {
    import SnapshotSupport._
    val dir = Files.createTempDirectory("reach").toString
    Files.write(java.nio.file.Paths.get(dir, "seg-000.jsonl"), "x\n".getBytes)
    assert(decideResume(BacklogSource.BacklogOffset(0, 1), dir, Halt) == Resume)
    assert(decideResume(BacklogSource.BacklogOffset(5, 0), dir, Adapt) == Resnapshot)
    decideResume(BacklogSource.BacklogOffset(5, 0), dir, Halt) match {
      case HaltWith(reason) => assert(reason.contains("purged"))
      case other => fail(s"expected halt, got $other")
    }
  }
}
