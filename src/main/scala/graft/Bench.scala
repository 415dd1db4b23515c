package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
 * emits ONE JSON line {"metric","value","unit","queries","sf",...}.
 *
 * Hardened against the sandbox's episodic machine-wide stalls (round-1
 * BENCH was stall-poisoned and its stdout JSON was lost in sbt noise):
 *  - each query runs K=2 times; the reported number is the MIN wall time;
 *  - process-CPU seconds are reported alongside wall ("queries_cpu") so a
 *    stall (wall >> cpu) is distinguishable from a slow plan;
 *  - a stall warning is logged to stderr when the min run still shows
 *    wall >> cpu;
 *  - the JSON line is written to a FILE (bench_out.json, override with
 *    SPARK_GRAFT_BENCH_OUT) as well as stdout, so the driver's parse no
 *    longer depends on scraping sbt output.
 *
 * Tuned for local[32] over single-file parquet inputs: small
 * maxPartitionBytes so a 20 MB file still scans with full parallelism,
 * AQE on (skew/coalesce), shuffle partitions = cores.
 */
object Bench {
  private val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]

  /** Run `body` once; returns (wallSec, processCpuSec). */
  private def timed(body: => Unit): (Double, Double) = {
    val c0 = osBean.getProcessCpuTime
    val t0 = System.nanoTime()
    body
    val wall = (System.nanoTime() - t0) / 1e9
    val cpu = (osBean.getProcessCpuTime - c0) / 1e9
    (wall, cpu)
  }

  /** Min-wall of `k` runs; None when every rep failed. */
  private def best(name: String, k: Int)(body: => Unit): Option[(Double, Double)] = {
    val runs = (1 to k).map { _ =>
      try timed(body) catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          (Double.NaN, Double.NaN)
      }
    }
    val ok = runs.filterNot(_._1.isNaN)
    ok.minByOption(_._1).map { m =>
      // < 0.5 cores busy on average over a 32-core JVM and slow in absolute
      // terms: almost certainly a host-level stall, not plan cost.
      if (m._1 > 5.0 && m._2 / m._1 < 0.5)
        System.err.println(f"[bench] STALL WARNING: $name wall=${m._1}%.1fs cpu=${m._2}%.1fs — host stall likely")
      m
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
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

    // SPARK_GRAFT_BENCH_ONLY=a,b,c limits the run (local iteration aid)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
        val r = best(name, reps) {
          spark.catalog.clearCache() // operators persist intermediates; don't let them pile up across runs
          System.gc() // reclaim prior queries' broadcast/shuffle refs — measured 2× CPU drift without it
          // noop sink, not count(): count() lets ColumnPruning drop computed
          // output columns (envelope JSON, flattened fields, text scores) —
          // the timing then omits the very work the query claims. The noop
          // writer evaluates EVERY output column and discards the bytes.
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        }
        (name, r)
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
      // orders.parquet is ONE sub-4m file → one scan task; a real backlog
      // arrives as many segments, so spread the synthesized stream across
      // the executor threads (the exchange is timed — part of the pipeline)
      // spread BEFORE the ×mult explode: the exchange then carries the 150k
      // base rows, and the explode + everything downstream runs 32-wide
      val par = spark.sparkContext.defaultParallelism
      val backlog = graft.sources.CdcSynth.changeEvents(
        orders.repartition(par)
          .withColumn("_rep", explode(array((0L until mult).map(lit): _*)))
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
      // sum(length(...)) over BOTH output columns, not count(): count() lets
      // ColumnPruning drop the envelope/routing projections entirely, so it
      // would measure synth+filter only — the envelope encode is the bulk of
      // the work the reference's 151K number includes
      best("drain", reps)(
        chain.agg(sum(length(col("value"))) + sum(length(col("topic")))).head()) match {
        case Some((wall, _)) if wall > 0 => math.round(inputEvents / wall)
        case _ => 0L
      }
    }

    // Scale probe for the dedup family — the "sf1" datapoint. No sf1
    // testdata exists, so scale the sf0.1 corpus 10× with TOKEN-SALTED
    // replicas: replica r suffixes every token with _r, so each replica
    // shard reproduces the original corpus's internal near-dup structure
    // while sharing zero shingles across shards — the realistic "bigger
    // corpus" model (10 independent shards), not a 10-clique of dups per
    // document. (Word ROTATION fails here: rotations share nearly all
    // cyclic n-grams, making every replica a near-dup of its siblings and
    // exploding the pair graph quadratically — measured 37× CPU.)
    // Near-linear CPU growth (≲12× for 10× data) proves the df-capped
    // posting join + checkpointed CC hold at the next scale step.
    // SPARK_GRAFT_SCALE_PROBE=0 skips (local iteration aid).
    val scaleProbe: String =
      if (sys.env.get("SPARK_GRAFT_SCALE_PROBE").contains("0")) "null"
      else {
        import org.apache.spark.sql.functions._
        import graft.llm.Dedup
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .repartition(spark.sparkContext.defaultParallelism)
        def scaled(mult: Int) =
          if (mult == 1) docs
          else docs
            .withColumn("_rep", explode(array((0 until mult).map(lit): _*)))
            .withColumn("doc_id", col("doc_id") * mult + col("_rep"))
            .withColumn("text", when(col("_rep") === 0, col("text")).otherwise(
              array_join(transform(split(col("text"), " "),
                t => concat(t, lit("_"), col("_rep"))), " ")))
            .drop("_rep")
        def probe(mult: Int): (Double, Double, Double, Double) = {
          spark.catalog.clearCache(); System.gc()
          val d = scaled(mult)
          val (jw, jc) = timed(
            Dedup.jaccardPairs(d, 0.5, maxDf = Some(1000L))
              .write.mode("overwrite").format("noop").save())
          spark.catalog.clearCache(); System.gc()
          val (cw, cc) = timed(
            Dedup.clusters(d, Dedup.jaccardPairs(d, 0.5, maxDf = Some(1000L)))
              .write.mode("overwrite").format("noop").save())
          (jw, jc, cw, cc)
        }
        try {
          val (j1w, j1c, c1w, c1c) = probe(1)
          val (j10w, j10c, c10w, c10c) = probe(10)
          f"""{"mult":10,"dedup_jaccard":{"x1_wall":$j1w%.2f,"x1_cpu":$j1c%.2f,"x10_wall":$j10w%.2f,"x10_cpu":$j10c%.2f,"cpu_growth":${j10c / math.max(j1c, 0.01)}%.2f},"dedup_clusters":{"x1_wall":$c1w%.2f,"x1_cpu":$c1c%.2f,"x10_wall":$c10w%.2f,"x10_cpu":$c10c%.2f,"cpu_growth":${c10c / math.max(c1c, 0.01)}%.2f}}"""
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] scale probe failed: ${e.getMessage}")
            "null"
        }
      }

    // failed queries are excluded from the total and listed separately —
    // a -1 sentinel summed into "value" silently deflates the total
    val ok = results.collect { case (k, Some((w, c))) => (k, w, c) }
    val failed = results.collect { case (k, None) => k }
    val qs = ok.map { case (k, w, _) => "\"" + k + "\":" + w }.mkString("{", ",", "}")
    val qsCpu = ok.map { case (k, _, c) => "\"" + k + "\":" + c }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ok.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_cpu":$qsCpu,"failed":$failedJson,"runs_per_query":$reps,"sf":"$sfDir","drain_events_per_s":$drainEps,"scale_probe_x10":$scaleProbe}"""
    val pw = new java.io.PrintWriter(outPath)
    try { pw.println(json) } finally { pw.close() }
    println(json)
    spark.stop()
    // Sentinel-prefixed FINAL stdout line, printed after spark.stop() so no
    // Spark shutdown chatter follows it. sbt appends its own "[success]
    // Total time" line, so a driver scraping the LAST line never sees bare
    // JSON (BENCH_r02/r03 both parsed:null) — grep for this prefix instead
    // (or read bench_out.json, written above).
    println(s"BENCH_JSON: $json")
  }
}
