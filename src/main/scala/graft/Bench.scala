package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
 * prints ONE JSON line {"metric","value","unit","queries","sf"}.
 *
 * Tuned for local[32] over single-file parquet inputs: small
 * maxPartitionBytes so a 20 MB file still scans with full parallelism,
 * AQE on (skew/coalesce), shuffle partitions = cores.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    spark.range(1000000L).selectExpr("sum(id)").collect() // JVM/codegen warmup

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      spark.catalog.clearCache() // operators persist intermediates; don't let them pile up across queries
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Backlog-drain throughput, comparable to the reference's headline
    // (151K events/s MySQL→Kafka, docs/src/performance.md:15-17): 1M change
    // events through the full processor chain (filter gates + routing
    // template + Debezium envelope encode), network sink excluded.
    val drainEps = {
      import org.apache.spark.sql.functions._
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      val n = 1000000L
      val mult = math.max(1L, n / math.max(orders.count(), 1L))
      val backlog = graft.sources.CdcSynth.changeEvents(
        orders.withColumn("_rep", explode(array((0L until mult).map(lit): _*)))
          .withColumn("o_orderkey", col("o_orderkey") * mult + col("_rep"))
          .drop("_rep"),
        "inventory", "orders", "o_orderkey")
      val chain = {
        import graft.operators._
        val filtered = FilterProcessor(FilterProcessor.Config(
          ops = Seq("c", "u", "d"),
          tables = Seq("inventory.*"),
          predicates = Seq(FilterProcessor.Exists("o_orderkey"))))(backlog)
        filtered.select(
          Routing.resolveTopic(Some("cdc.${source.db}.${source.table}"), "events").as("topic"),
          Envelopes.debezium.as("value"))
      }
      val inputEvents = orders.count() * mult
      val t0 = System.nanoTime()
      chain.count()
      val secs = (System.nanoTime() - t0) / 1e9
      math.round(inputEvents / secs)
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","drain_events_per_s":$drainEps}""")
    spark.stop()
  }
}
