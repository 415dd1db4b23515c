package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * CPU attribution for cdc_filter: synth vs filter vs projection+sort
 * (`runMain graft.FilterProfile`, SPARK_GRAFT_SF_DIR to pick the scale).
 * Findings recorded in PLANS.md "cdc_filter CPU attribution".
 */
object FilterProfile {
  private val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]

  private def timed(name: String)(body: => Unit): Unit = {
    System.gc()
    val c0 = osBean.getProcessCpuTime
    val t0 = System.nanoTime()
    body
    val wall = (System.nanoTime() - t0) / 1e9
    val cpu = (osBean.getProcessCpuTime - c0) / 1e9
    println(f"PROFILE $name%-28s wall=$wall%7.2fs cpu=$cpu%7.2fs")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    import graft.operators.FilterProcessor
    import graft.operators.FilterProcessor._
    import graft.core.ChangeEvent
    import graft.sources.CdcSynth
    import org.apache.spark.sql.types._

    def orders = spark.read.parquet(s"$dir/orders.parquet")
    def synth = CdcSynth.changeEvents(orders, "inventory", "orders", "o_orderkey",
      tsCol = Some("o_orderdate"))
    val cfg = Config(
      ops = Seq(ChangeEvent.Op.Create, ChangeEvent.Op.Update),
      tables = Seq("inventory.*"),
      predicates = Seq(Gt("o_totalprice", 150000), In("o_orderstatus", Seq("F", "O"))),
      matchMode = MatchAll)
    def jget(c: String, p: String) = get_json_object(col(c), "$." + p)

    (1 to 2).foreach { round =>
      println(s"-- round $round --")
      timed("scan_only")(orders.write.mode("overwrite").format("noop").save())
      timed("synth_only")(synth.write.mode("overwrite").format("noop").save())
      timed("synth+filter")(FilterProcessor(cfg)(synth)
        .write.mode("overwrite").format("noop").save())
      timed("synth+filter+proj")(FilterProcessor(cfg)(synth)
        .select(jget("after", "o_orderkey").cast(LongType).as("o_orderkey"), col("op"),
          jget("after", "o_totalprice").cast(DoubleType).as("o_totalprice"))
        .write.mode("overwrite").format("noop").save())
      timed("full_query_with_sort")(SparkEntry.queries("cdc_filter")(spark, dir)
        .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
