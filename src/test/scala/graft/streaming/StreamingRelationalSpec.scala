package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files
import java.sql.Timestamp

/**
 * Relational operators over change streams (SURVEY §2.8 / M7): watermarked
 * windowed aggregation, watermark-bounded dedup, stream-static joins —
 * the state-bounded shapes that survive 100 TB streams.
 */
class StreamingRelationalSpec extends SparkSpec {

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("watermarked tumbling-window aggregation over an event stream") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val dir = Files.createTempDirectory("win").toString
    val agg = ms.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_v"))
    val q = agg.writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/chk")
      .format("memory").queryName("win_agg")
      .trigger(Trigger.ProcessingTime("200 milliseconds")).start()
    ms.addData((ts(0), "a", 1.0), (ts(1), "a", 2.0), (ts(6), "b", 3.0))
    q.processAllAvailable()
    ms.addData((ts(30), "a", 9.0)) // advances watermark past the first windows
    q.processAllAvailable()
    val rows = spark.table("win_agg").collect()
    q.stop()
    // first two windows finalized: (0-5: a→2 events) and (5-10: b→1)
    assert(rows.exists(r => r.getAs[String]("event_type") == "a" && r.getAs[Long]("n") == 2))
    assert(rows.exists(r => r.getAs[String]("event_type") == "b" && r.getAs[Long]("n") == 1))
  }

  test("watermark-bounded dedup by event_id (at-least-once → exactly-once view)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val dir = Files.createTempDirectory("dedup").toString
    val deduped = ms.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/chk")
      .format("memory").queryName("dedup_stream")
      .trigger(Trigger.ProcessingTime("200 milliseconds")).start()
    ms.addData((ts(0), "e1"), (ts(1), "e2"), (ts(1), "e1")) // e1 replayed
    q.processAllAvailable()
    ms.addData((ts(2), "e1"), (ts(30), "e9")) // replay again + watermark push
    q.processAllAvailable()
    val n = spark.table("dedup_stream").count()
    q.stop()
    assert(n == 3) // e1 once, e2, e9
  }

  test("stream-static broadcast join enriches change events with a dimension") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("cust_id", "tier")
    val ms = MemoryStream[(Long, Double)]
    val dir = Files.createTempDirectory("ssj").toString
    val joined = ms.toDF().toDF("cust_id", "amount")
      .join(broadcast(dim), "cust_id")
    val q = joined.writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/chk")
      .format("memory").queryName("enriched")
      .trigger(Trigger.ProcessingTime("200 milliseconds")).start()
    ms.addData((1L, 10.0), (2L, 20.0), (3L, 30.0)) // 3 has no dim row
    q.processAllAvailable()
    val rows = spark.table("enriched").collect()
    q.stop()
    assert(rows.length == 2)
    assert(rows.find(_.getAs[Long]("cust_id") == 1L).get.getAs[String]("tier") == "gold")
  }
}
