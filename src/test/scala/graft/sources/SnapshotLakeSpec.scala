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
