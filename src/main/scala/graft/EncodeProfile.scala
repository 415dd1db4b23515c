package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Single-thread (local[1]) profile of the two JSON encode stages the drain
 * headline pays per event — payload (orders row → JSON string) and envelope
 * (ChangeEvent → wire JSON) — builtin `to_json` vs the fused byte-level
 * encoder, over the SAME cached input. The r16 drain A/B showed the fused
 * template REGRESSING the drain ~30% once the silent-fallback routing bug
 * was fixed (base 41 task-CPU-s → 54); this instrument attributes the gap
 * to per-writer terms so the fix is measured, not guessed.
 *
 * Usage: java -cp <classes>:<spark jars> graft.EncodeProfile [rows] [reps]
 */
object EncodeProfile {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 1000000
    val reps = if (args.length > 1) args(1).toInt else 5
    val threads = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .appName("encode-profile").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // orders-shaped payload source (same field mix as the drain: longs,
    // short+long strings, a double, an int)
    val src = spark.range(rows).select(
      col("id").as("o_orderkey"),
      (col("id") % 150000).as("o_custkey"),
      when(col("id") % 3 === 0, "O").otherwise("F").as("o_orderstatus"),
      ((col("id") % 100000).cast("double") / 100.0 + 1.01).as("o_totalprice"),
      // the driver parquet stores micros → the drain reads TimestampNTZ
      // (nanosAsLong affects only NANOS files) — the temporal writer IS
      // on the drain's payload hot path, so profile it faithfully
      timestamp_micros(lit(1700000000000000L) + col("id"))
        .cast("timestamp_ntz").as("o_orderdate"),
      concat(lit("PRIO-"), (col("id") % 5)).as("o_orderpriority"),
      concat(lit("Clerk#00000"), (col("id") % 1000)).as("o_clerk"),
      (col("id") % 2).cast("int").as("o_shippriority"),
      concat(lit("comment text with some length to it, roughly tpch sized "),
        col("id")).as("o_comment"))
      .persist()
    src.count()

    def time(label: String, df: DataFrame): Unit = {
      var best = Double.MaxValue
      var i = 0
      while (i < reps) {
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.foreachPartition { it =>
          var n = 0L
          while (it.hasNext) { it.next(); n += 1 }
        }
        val sec = (System.nanoTime() - t0) / 1e9
        if (i > 0 && sec < best) best = sec // skip warmup rep
        i += 1
      }
      println(f"$label%-28s ${best * 1e9 / rows}%8.1f ns/row  ($best%.3f s best-of-${reps - 1})")
    }

    val payloadCols = struct(src.columns.map(col).toIndexedSeq: _*)
    time("payload_builtin", src.select(to_json(payloadCols).as("j")))
    time("payload_fused",
      src.select(graft.functions.JsonEncode.fusedJsonFor(payloadCols, src.schema).as("j")))

    // envelope over a PRE-MATERIALIZED payload string (isolates the
    // envelope writers from the payload encode)
    val withPayload = src
      .select(to_json(payloadCols).as("pj"), col("o_orderkey").as("pk"))
      .persist()
    withPayload.count()
    val env = graft.sources.CdcSynth.changeEvents(
      withPayload, "bench", "orders", "pk", payloadOverride = Some(col("pj")))
    // Envelopes.native reads the conformed frame; time builtin vs fused
    val conformed = env.persist()
    conformed.count()
    time("envelope_fused", conformed.select(graft.operators.Envelopes.native.as("j")))
    time("envelope_builtin",
      conformed.select(to_json(struct(graft.core.ChangeEvent.schema.fields.map(f =>
        col(f.name)).toIndexedSeq: _*)).as("j")))

    spark.stop()
  }
}
