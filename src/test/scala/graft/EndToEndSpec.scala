package graft

import graft.core.ChangeEvent
import graft.operators.FilterProcessor
import graft.sources.BacklogSource
import graft.streaming._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.{Files, Paths}

/**
 * The M1 slice end-to-end: backlog segments → DSv2 source → envelope parse →
 * filter processor → multi-sink fan-out (parquet lake + memory) with per-sink
 * ledger — the full reference pipeline shape in one streaming query.
 */
class EndToEndSpec extends SparkSpec {

  test("backlog → parse → filter → lake + memory sinks → ledger commit") {
    val dir = Files.createTempDirectory("e2e").toString
    val events = (1 to 40).map { i =>
      val op = if (i % 10 == 0) "d" else if (i % 3 == 0) "u" else "c"
      s"""{"op":"$op","after":${if (op == "d") "null" else s"\"{\\\"id\\\":$i}\""},""" +
        s""""ts_ms":${1700000000000L + i},"event_id":"e$i",""" +
        s""""source":{"db":"inventory","table":"orders","sequence":$i},"tx_end":true}"""
    }
    Files.createDirectories(Paths.get(s"$dir/backlog"))
    Files.write(Paths.get(s"$dir/backlog/seg-000.jsonl"),
      events.mkString("\n").getBytes)

    val stream = spark.readStream.format(classOf[BacklogSource].getName)
      .option("path", s"$dir/backlog").load()
      .select(from_json(col("value"), ChangeEvent.schema).as("e"))
      .select("e.*")

    val lake = new ParquetLakeSink("lake", s"$dir/lake")
    val mem = new MemorySink("mem")
    val cfg = CdcPipeline.Config(
      sinks = Seq(lake, mem),
      ledgerDir = s"$dir/ledger",
      processors = Seq(
        (df: DataFrame) => ChangeEvent.conform(df),
        FilterProcessor(FilterProcessor.Config(ops = Seq("c", "u"))) _))

    val q = CdcPipeline.start(cfg, stream, s"$dir/chk", Trigger.AvailableNow())
    q.awaitTermination(120000)

    val expected = (1 to 40).count(i => i % 10 != 0) // deletes filtered
    assert(mem.totalRows == expected)
    val lakeRows = spark.read.parquet(s"$dir/lake")
    assert(lakeRows.count() == expected)
    assert(lakeRows.select("table").distinct().head().getString(0) == "orders")
    assert(lakeRows.columns.contains("year")) // hive layout present
    val ledger = new SinkLedger(s"$dir/ledger")
    assert(ledger.minCommitted(Seq("lake", "mem")) >= 0L)
  }
}
