package graft.operators

import graft.core.ChangeEvent
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}

import java.util.concurrent.{Executors, TimeUnit, TimeoutException}

/**
 * User-transform host — the reference's JavaScript processor slot
 * (crates/processors/src/js.rs:74-130: user code may mutate, drop, or fan out
 * events; 5 s per-batch timeout js.rs:462-466; routing preamble :61-70).
 *
 * Spark-first: instead of a V8 worker thread with JSON serialization both
 * ways, the user supplies a Scala transform over typed [[UserEvent]] views;
 * it runs inside `mapPartitions` (executor-side, parallel, no driver hop).
 * The per-partition timeout guard reproduces the reference's runaway-script
 * protection. `synthetic` marking (reference SyntheticMarkingProcessor,
 * processors/src/synthetic.rs:28-65) is declarative: fan-out events the
 * transform creates without an id inherit `synthetic = processorId`.
 */
object UdfHost {

  /** Mutable-friendly user view of an event (the JS object analog). */
  case class UserEvent(
      before: String,
      after: String,
      op: String,
      tsMs: Long,
      eventId: String,
      table: String,
      db: String,
      // routing preamble: ev.route({topic,key}) analog
      topic: String = null,
      key: String = null,
      synthetic: String = null)

  type Transform = Iterator[UserEvent] => Iterator[UserEvent]

  /**
   * Apply a user transform to the envelope DataFrame. Chunked timeout: each
   * `chunkSize` events must complete within `timeoutMs` (the reference
   * enforces 5 s per batch).
   */
  def apply(processorId: String, transform: Transform,
            timeoutMs: Long = 5000, chunkSize: Int = 2000)(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val in = df.select("before", "after", "op", "ts_ms", "event_id",
      "source.table", "source.db")
    val out = in.mapPartitions { rows =>
      val userRows = rows.map { r =>
        UserEvent(r.getString(0), r.getString(1), r.getString(2),
          if (r.isNullAt(3)) 0L else r.getLong(3), r.getString(4), r.getString(5), r.getString(6))
      }
      val pool = Executors.newSingleThreadExecutor()
      val guarded = userRows.grouped(chunkSize).flatMap { chunk =>
        val fut = pool.submit(new java.util.concurrent.Callable[Seq[UserEvent]] {
          def call(): Seq[UserEvent] = transform(chunk.iterator).toSeq
        })
        try fut.get(timeoutMs, TimeUnit.MILLISECONDS)
        catch {
          case _: TimeoutException =>
            fut.cancel(true)
            throw new RuntimeException(
              s"udf processor $processorId exceeded ${timeoutMs}ms for a $chunkSize-event chunk")
        }
      }
      new Iterator[UserEvent] {
        def hasNext: Boolean = { val h = guarded.hasNext; if (!h) pool.shutdown(); h }
        def next(): UserEvent = guarded.next()
      }
    }

    // rebuild envelope: transform output joined back to original envelopes by
    // event id; fabricated events (unknown/absent id) are synthetic
    import org.apache.spark.sql.functions._
    val outDf = out.toDF().withColumnRenamed("synthetic", "_u_synth")
    val orig = df.drop("before", "after", "op", "ts_ms")
      .withColumnRenamed("synthetic", "_orig_synth")
    val joined = outDf.join(orig, outDf("eventId") === orig("event_id"), "left")
      .withColumn("synthetic",
        when(col("event_id").isNull, lit(processorId))
          .otherwise(coalesce(col("_u_synth"), col("_orig_synth"))))
      .withColumn("event_id", coalesce(col("event_id"), col("eventId")))
      .withColumn("routing", when(col("topic").isNotNull || col("key").isNotNull,
        struct(col("topic"), col("key"),
          lit(null).cast("map<string,string>").as("headers"),
          lit(false).as("raw_payload"))).otherwise(col("routing")))
      .withColumn("ts_ms", col("tsMs"))
    ChangeEvent.conform(joined
      .drop("eventId", "topic", "key", "tsMs", "table", "db", "_u_synth", "_orig_synth"))
  }
}
