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
}
