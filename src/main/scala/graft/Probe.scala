package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Repurposable ad-hoc decomposition harness (not part of the library
 * surface): current experiment = ann_ivf_trained cost anatomy — where does
 * the training loop's task CPU go at ×1 vs ×10, with and without an
 * exchange barrier between assignment and the posexplode mean. */
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

    import graft.llm.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def scaled(mult: Int) =
      if (mult == 1) emb
      else emb.withColumn("_rep", explode(array((0 until mult).map(lit): _*)))
        .withColumn("vec_id", col("vec_id") * mult + col("_rep"))
        .withColumn("embedding",
          when(col("_rep") === 0, col("embedding")).otherwise(
            zip_with(col("embedding"), sequence(lit(0), size(col("embedding")) - 1),
              (x, i) => (x * (pmod(hash(col("_rep") * 1024 + i), lit(2)) * 2 - 1))
                .cast("float"))))
        .drop("_rep")

    for (m <- Seq(1, 10)) {
      val base0 = scaled(m)
      // materialize the corpus as parquet like the bench does (32 files)
      val dir = s"/tmp/probe_ivf_x$m"
      base0.repartition(32).write.mode("overwrite").parquet(dir)
      val v = spark.read.parquet(dir)
      val n = v.count()
      for (rep <- 1 to 2) {
        val (w1, c1) = timed {
          Similarity.trainCentroidsSeq(v, k = 8, iters = 3): Unit
        }
        println(f"PROBE x$m rep$rep n=$n train wall=$w1%.2f taskCpu=$c1%.2f")
      }
      // decompose: assignment-only scan (no explode)
      val cents = Similarity.trainCentroidsSeq(v, k = 8, iters = 0)
      val (w2, c2) = timed {
        Similarity.ivfAssignLiteral(v, cents)
          .write.mode("overwrite").format("noop").save()
      }
      println(f"PROBE x$m assignOnly wall=$w2%.2f taskCpu=$c2%.2f")
      // explode WITHOUT barrier (the pre-r8 shape)
      val (w3, c3) = timed {
        Similarity.ivfAssignLiteral(v, cents, idCol = "vec_id", vecCol = "embedding")
          .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy(col("centroid_id"), col("pos")).agg(avg(col("x")).as("m"))
          .write.mode("overwrite").format("noop").save()
      }
      println(f"PROBE x$m explodeNoBarrier wall=$w3%.2f taskCpu=$c3%.2f")
      // explode WITH barrier
      val (w4, c4) = timed {
        Similarity.ivfAssignLiteral(v, cents, idCol = "vec_id", vecCol = "embedding")
          .repartition(32)
          .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy(col("centroid_id"), col("pos")).agg(avg(col("x")).as("m"))
          .write.mode("overwrite").format("noop").save()
      }
      println(f"PROBE x$m explodeBarrier wall=$w4%.2f taskCpu=$c4%.2f")
      // cosines alone, no struct/greatest
      val (w5, c5) = timed {
        v.select(cents.map { case (cid, cv) =>
          Similarity.cosine(col("embedding"), array(cv.map(lit): _*)).as(s"c$cid")
        }: _*).write.mode("overwrite").format("noop").save()
      }
      println(f"PROBE x$m cosinesOnly wall=$w5%.2f taskCpu=$c5%.2f")
      // greatest over plain doubles (no struct)
      val (w6, c6) = timed {
        v.select(greatest(cents.map { case (_, cv) =>
          Similarity.cosine(col("embedding"), array(cv.map(lit): _*))
        }: _*).as("g")).write.mode("overwrite").format("noop").save()
      }
      println(f"PROBE x$m greatestDouble wall=$w6%.2f taskCpu=$c6%.2f")
      // single cosine
      val (w7, c7) = timed {
        v.select(Similarity.cosine(col("embedding"),
          array(cents.head._2.map(lit): _*)).as("c")).write.mode("overwrite")
          .format("noop").save()
      }
      println(f"PROBE x$m oneCosine wall=$w7%.2f taskCpu=$c7%.2f")
      // baseline: scan only
      val (w8, c8) = timed {
        v.select(col("vec_id")).write.mode("overwrite").format("noop").save()
      }
      println(f"PROBE x$m scanOnly wall=$w8%.2f taskCpu=$c8%.2f")
      // JIT theory: same cosine, 2 BIG tasks instead of 32 tiny ones — if
      // per-row cost collapses, the 32-wide numbers are interpretation
      // (fresh codegen class per stage, tasks too small to reach C2)
      for (rep <- 1 to 2) {
        val (w9, c9) = timed {
          v.coalesce(2).select(Similarity.cosine(col("embedding"),
            array(cents.head._2.map(lit): _*)).as("c")).write.mode("overwrite")
            .format("noop").save()
        }
        println(f"PROBE x$m oneCosineCoalesce2 rep$rep wall=$w9%.2f taskCpu=$c9%.2f")
      }
      // and 32-wide again twice — same generated class re-run (JIT-warm)
      for (rep <- 1 to 2) {
        val (wA, cA) = timed {
          v.select(Similarity.cosine(col("embedding"),
            array(cents.head._2.map(lit): _*)).as("c")).write.mode("overwrite")
            .format("noop").save()
        }
        println(f"PROBE x$m oneCosine32 rep$rep wall=$wA%.2f taskCpu=$cA%.2f")
      }
    }
    spark.stop()
  }
}
