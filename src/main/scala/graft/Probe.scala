package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Repurposable ad-hoc decomposition harness (not part of the library
 * surface): current experiment = cdc_binlog_decode ×10 anatomy in a FRESH
 * JVM — the full-suite probe measures 18.8× task-CPU growth (30→570 s)
 * under the symmetric layout-matched protocol; decompose encode (rows →
 * segments), decode (segments → rows), and the final sort at ×1 vs ×10 to
 * find whether the superlinearity is in the plan or in tail-of-JVM
 * allocation state the per-query quiesce can't clear. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskNs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) taskNs.addAndGet(m.executorCpuTime): Unit
      }
    })
    def timed(f: => Unit): (Double, Double) = {
      Thread.sleep(100); taskNs.set(0)
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(150)
      (wall, taskNs.get / 1e9)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    import graft.sources.{MysqlBinlog, MysqlBinlogFixture => Fx}
    val orders0 = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")

    // the bench's ×N builder shape: key remap, same 32-file layout for both
    def build(mult: Int): String = {
      val dir = s"/tmp/probe_binlog_x$mult"
      val repsArr = array((0 until mult).map(lit): _*)
      orders0.withColumn("_rep", explode(repsArr))
        .withColumn("o_orderkey",
          (col("o_orderkey").cast("long") * mult + col("_rep")).cast("long"))
        .drop("_rep")
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(dir)
      dir
    }

    for (m <- Seq(1, 10); dir = build(m)) {
      val orders = spark.read.parquet(dir)
      val n = orders.count()
      for (rep <- 1 to 2) {
        // full query as benched (encode + decode + filter + sort)
        val (w1, c1) = timed {
          noop(Fx.decodedOrders(orders)
            .filter(col("op").isin("c", "u", "d"))
            .select(col("pos"), col("op"), col("before"), col("after"))
            .orderBy("pos"))
        }
        println(f"PROBE x$m rep$rep n=$n full wall=$w1%.2f taskCpu=$c1%.2f")
      }
      // no final sort
      val (w2, c2) = timed {
        noop(Fx.decodedOrders(orders)
          .filter(col("op").isin("c", "u", "d"))
          .select(col("pos"), col("op"), col("before"), col("after")))
      }
      println(f"PROBE x$m noSort wall=$w2%.2f taskCpu=$c2%.2f")
      // encode only: rows → segments (the fixture synthesis half)
      val (w3, c3) = timed { noop(Fx.ordersSegments(orders).toDF("seg")) }
      println(f"PROBE x$m encodeOnly wall=$w3%.2f taskCpu=$c3%.2f")
      // decode only: segments materialized once (off the clock), then decoded
      val segs = Fx.ordersSegments(orders).localCheckpoint(true)
      val nSegs = segs.count()
      for (rep <- 1 to 2) {
        val (w4, c4) = timed {
          import spark.implicits._
          val names = Fx.ordersCols.map(_.name).toIndexedSeq
          noop(segs.flatMap(seg => MysqlBinlog.decodeSegment(seg, (_, _) => names)).toDF())
        }
        println(f"PROBE x$m rep$rep segs=$nSegs decodeOnly wall=$w4%.2f taskCpu=$c4%.2f")
      }
      segs.unpersist(true)
    }
    spark.stop()
  }
}
