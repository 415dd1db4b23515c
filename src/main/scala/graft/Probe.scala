package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Repurposable ad-hoc decomposition harness (not part of the library
 * surface): current experiment = fused NESTED JSON decode (r15) vs builtin
 * from_json on a nested change-payload shape at ×10 (1.5M rows), fresh
 * JVM, min-of-2 with clearCache+gc per rep. */
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

    val o = spark.read.parquet("/tmp/ab_x10/orders.parquet")
    // nested payload: struct order{id,status,price}, array<long> items,
    // array<struct{k,v}> attrs — the reference's List<T> envelope shape
    val payload = to_json(struct(
      struct(col("o_orderkey").as("id"), col("o_orderstatus").as("status"),
        col("o_totalprice").as("price")).as("order"),
      array(col("o_orderkey"), col("o_custkey"), col("o_orderkey") % 7).as("items"),
      array(
        struct(lit("prio").as("k"), col("o_orderpriority").as("v")),
        struct(lit("stat").as("k"), col("o_orderstatus").as("v"))).as("attrs")))
    val src = o.select(col("o_orderkey"), payload.as("j")).localCheckpoint(true)
    println(s"rows=${src.count()}")
    val sch = StructType(Seq(
      StructField("order", StructType(Seq(
        StructField("id", LongType), StructField("status", StringType),
        StructField("price", DoubleType)))),
      StructField("items", ArrayType(LongType)),
      StructField("attrs", ArrayType(StructType(Seq(
        StructField("k", StringType), StructField("v", StringType)))))))
    def projected(parsed: org.apache.spark.sql.Column) =
      src.select(col("o_orderkey"), parsed.as("p"))
        .select(col("o_orderkey"), col("p.order.id").as("id"),
          col("p.order.price").as("price"), col("p.items").as("items"),
          col("p.attrs").as("attrs"))
    // warmups
    noop(projected(graft.functions.JsonDecode.fusedFromJson(col("j"), sch)))
    noop(projected(from_json(col("j"), sch)))
    for (rep <- 1 to 2) {
      spark.catalog.clearCache(); System.gc()
      val (wf, cf) = timed { noop(projected(graft.functions.JsonDecode.fusedFromJson(col("j"), sch))) }
      println(f"PROBE rep$rep fused_nested wall=$wf%.2f taskCpu=$cf%.2f")
      spark.catalog.clearCache(); System.gc()
      val (wb, cb) = timed { noop(projected(from_json(col("j"), sch))) }
      println(f"PROBE rep$rep builtin_nested wall=$wb%.2f taskCpu=$cb%.2f")
    }
    spark.stop()
  }
}
