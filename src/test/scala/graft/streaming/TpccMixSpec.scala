package graft.streaming

import graft.SparkSpec
import graft.sources.CdcSynth
import org.apache.spark.sql.functions._

/**
 * TPC-C-mix drain workload (reference crates/chaos/src/scenarios/tpcc.rs):
 * the 45/43/12 terminal roll, multi-table multi-row transaction anatomy,
 * and the C-1 invariant the mix exists to stress — a batch boundary never
 * splits a source transaction (coordinator.rs:87-110 respect_source_tx).
 */
class TpccMixSpec extends SparkSpec {

  test("terminal roll proportions and transaction anatomy") {
    val ev = CdcSynth.tpccEvents(spark, 2000)
    val perTx = ev.groupBy(col("source.tx_id").as("tx"))
      .agg(count(lit(1)).as("n"),
        collect_set(col("source.table")).as("tables"),
        sum(when(col("tx_end"), 1).otherwise(0)).as("n_end"),
        max(when(col("tx_end"), col("source.sequence"))).as("end_seq"),
        max(col("source.sequence")).as("max_seq"),
        sum(when(col("op") === "d", 1).otherwise(0)).as("n_del"),
        sum(when(col("source.table") === "tpcc_order_line" && col("op") === "c", 1)
          .otherwise(0)).as("n_lines"),
        sum(when(col("source.table") === "tpcc_stock", 1).otherwise(0)).as("n_stock"))
      .collect()
    assert(perTx.length == 2000)
    // exactly one tx_end per transaction, on its LAST event
    assert(perTx.forall(r => r.getAs[Long]("n_end") == 1L &&
      r.getAs[Long]("end_seq") == r.getAs[Long]("max_seq")))

    def tables(r: org.apache.spark.sql.Row) = r.getAs[Seq[String]]("tables").toSet
    val newOrders = perTx.filter(r => tables(r).contains("tpcc_stock"))
    val payments = perTx.filter(r => tables(r).contains("tpcc_history"))
    val deliveries = perTx.filter(r => r.getAs[Long]("n_del") == 1L)
    assert(newOrders.length + payments.length + deliveries.length == 2000)
    // the 45/43/12 roll (deterministic hash ⇒ tight at n=2000)
    assert(math.abs(newOrders.length / 2000.0 - 0.45) < 0.04)
    assert(math.abs(payments.length / 2000.0 - 0.43) < 0.04)
    assert(math.abs(deliveries.length / 2000.0 - 0.12) < 0.04)
    // New-Order: 4 tables in ONE transaction, k lines matched by k stock
    // updates, k ∈ [5,15], 2+2k events total
    newOrders.foreach { r =>
      assert(tables(r) == Set("tpcc_order", "tpcc_new_order", "tpcc_order_line", "tpcc_stock"))
      val k = r.getAs[Long]("n_lines")
      assert(k >= 5 && k <= 15 && r.getAs[Long]("n_stock") == k &&
        r.getAs[Long]("n") == 2 + 2 * k)
    }
    // Payment: 3 UPDATEs across warehouse/district/customer + 1 history INSERT
    payments.foreach { r =>
      assert(tables(r) == Set("tpcc_warehouse", "tpcc_district", "tpcc_customer", "tpcc_history"))
      assert(r.getAs[Long]("n") == 4)
    }
    // Delivery: DELETE new_order then order/order_line/customer UPDATEs
    deliveries.foreach { r =>
      assert(tables(r) == Set("tpcc_new_order", "tpcc_order", "tpcc_order_line", "tpcc_customer"))
      assert(r.getAs[Long]("n") == 4)
    }
  }

  test("a batch boundary never splits a transaction (C-1 under the mix)") {
    val ev = CdcSynth.tpccEvents(spark, 300).persist()
    try {
      val fullPerTx = ev.groupBy(col("source.tx_id").as("tx"))
        .agg(count(lit(1)).as("n_full"))
      // cut INSIDE transaction 100 (after its second event): the offset
      // slice a micro-batch would naively deliver
      val cut = 100L * 40 + 1
      val batch = ev.filter(col("source.sequence") <= cut).persist()
      val (complete, carry) = CdcPipeline.splitCompleteTx(batch)
      val completeRows = complete.persist()
      val carryRows = carry.persist()
      // partition: nothing lost, nothing duplicated
      assert(completeRows.count() + carryRows.count() == batch.count())
      // the cut DID land mid-transaction
      assert(carryRows.count() == 2)
      assert(carryRows.select(col("source.tx_id")).distinct().collect()
        .map(_.getLong(0)).toSeq == Seq(100L))
      // all-or-nothing: every transaction in `complete` is whole
      val split = completeRows.groupBy(col("source.tx_id").as("tx"))
        .agg(count(lit(1)).as("n_batch"))
        .join(fullPerTx, "tx")
        .filter(col("n_batch") =!= col("n_full"))
      assert(split.count() == 0)
      // carryover events carry no tx_end — they re-enter the next batch
      assert(carryRows.filter(col("tx_end")).count() == 0)
    } finally ev.unpersist()
  }

  test("schema sensor rides a live TPC-C drain: CacheHit/Stabilized dominate after warmup, REST serves the sensed schemas") {
    // The e2e wiring the state-machine spec (SchemaSensorSpec) doesn't
    // cover: SchemaSensorStage.processor as a CdcPipeline stage on a
    // drain-scale workload, evolution ledger attached, REST surface live.
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-tpcc-sensor").toString
    val reg = new SchemaRegistry(spark, s"$dir/registry")
    val sensor = new SchemaSensor(
      // stabilizeAfter sized so the HIGH-traffic tables (order_line sees
      // ~9k events at 2000 txns) cross it mid-drain while low-traffic
      // tables stay in the CacheHit regime — both verdicts visible at once
      SchemaSensor.Config(warmupEvents = 100, sampleRate = 10, stabilizeAfter = 5000),
      registry = Some(reg))
    val sink = new MemorySink("mem")
    val cfg = CdcPipeline.Config(Seq(sink), ledgerDir = s"$dir/ledger",
      processors = Seq(SchemaSensorStage.processor(sensor)))
    val ledger = new SinkLedger(s"$dir/ledger")

    // live drain: 2000 transactions (~24k events, 9 tables) in 8
    // sequence-ordered micro-batches through the full coordinator
    val ev = CdcSynth.tpccEvents(spark, 2000).persist()
    try {
      val total = ev.count()
      val txPerBatch = 250L
      (0 until 8).foreach { b =>
        val batch = ev.filter(col("source.tx_id") >= b * txPerBatch &&
          col("source.tx_id") < (b + 1) * txPerBatch)
        CdcPipeline.processBatch(cfg, ledger)(batch, b.toLong)
      }
      assert(sink.totalRows == total) // sensing never stalled delivery

      val tables = sensor.tableNames.sorted
      assert(tables == Seq("tpcc_customer", "tpcc_district", "tpcc_history",
        "tpcc_new_order", "tpcc_order", "tpcc_order_line", "tpcc_stock",
        "tpcc_warehouse")) // 8 sensed tables (9th op is the delete-only path: no after image on new_order deletes — but new_order also gets creates, so all 8 appear)

      // after warmup the cache regime dominates: each table has ONE stable
      // payload structure, so misses stay O(structures) while hits count
      // the drained events — the reference's "driver sees structures, not
      // events" cost model at drain scale
      tables.foreach { t =>
        val st = sensor.state(t).get
        assert(st.fingerprint.nonEmpty && st.sequence == 0L) // no spurious evolution
        assert(st.cacheMisses <= 2, s"$t: ${st.cacheMisses} misses for one structure")
      }
      val deleteOnly = ev.filter(col("after").isNull).count()
      val sensed = tables.map(t => sensor.state(t).get.eventCount).sum
      assert(sensed == total - deleteOnly) // every payload-bearing event counted
      // high-traffic tables crossed stabilizeAfter mid-drain (terminal state);
      // low-traffic ones are still in the CacheHit regime
      assert(sensor.state("tpcc_order_line").get.stabilized)
      assert(sensor.state("tpcc_stock").get.stabilized)
      assert(!sensor.state("tpcc_warehouse").get.stabilized)
      val statsJson = sensor.cacheStatsJson
      val hits = "\"total_cache_hits\":(\\d+)".r.findFirstMatchIn(statsJson).get.group(1).toLong
      val misses = "\"total_cache_misses\":(\\d+)".r.findFirstMatchIn(statsJson).get.group(1).toLong
      assert(hits > 100 * misses, s"cache regime not dominant: $hits hits / $misses misses")

      // evolution ledger: the sensor REGISTERED each inferred schema once
      tables.foreach { t =>
        val latest = reg.latest(t)
        assert(latest.isDefined && latest.get._1 == 0L, s"$t: ${latest.map(_._1)}")
        assert(reg.getAtSequence(t, 0L).get.fieldNames.toSet ==
          Set("w_id", "d_id", "c_id", "o_id", "line", "amount"))
      }

      // REST: the sensed versions are visible over live HTTP
      val cp = new ControlPlane(spark).registerSensor("p1", sensor)
        .registerSchemaRegistry("p1", reg).start()
      try {
        val http = java.net.http.HttpClient.newHttpClient()
        def get(path: String): String = http.send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:${cp.boundPort}$path")).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString()).body()
        val schemas = get("/pipelines/p1/sensing/schemas")
        tables.foreach(t => assert(schemas.contains("\"" + t + "\"")))
        val detail = get("/pipelines/p1/sensing/schemas/tpcc_order_line")
        assert(detail.contains("\"amount\"") && detail.contains("\"stabilized\":true"))
        val stats = get("/pipelines/p1/sensing/stats")
        // hit_rate must be valid JSON number (locale-safe formatting)
        val rate = "\"hit_rate\":([0-9.]+)[,}]".r.findFirstMatchIn(stats)
          .map(_.group(1).toDouble)
        assert(rate.exists(_ > 0.9), s"bad hit_rate in $stats")
        assert(get("/pipelines/p1/schemas").contains("tpcc_order_line"))
      } finally cp.stop()
    } finally ev.unpersist()
  }
}
