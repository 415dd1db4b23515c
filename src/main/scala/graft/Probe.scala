package graft

import graft.llm.Dedup
import org.apache.spark.sql.SparkSession

/** Ad-hoc perf probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1000.0
        if (wall > 1.0) println(f"STAGE ${i.stageId}%4d ${i.name.take(40)}%-40s wall=$wall%7.2fs " +
          f"cpu=${i.taskMetrics.executorCpuTime / 1e9}%7.2fs run=${i.taskMetrics.executorRunTime / 1e3}%7.2fs " +
          f"tasks=${i.numTasks} gc=${i.taskMetrics.jvmGCTime / 1e3}%5.2fs")
      }
    })
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    time("warmup")(docs.count())
    if (sys.env.contains("PROBE_EXPLAIN")) {
      Dedup.minhashCandidates(docs, 64, 32).explain("formatted")
      spark.stop(); sys.exit(0)
    }
    time("sigs")(Dedup.minhashSignatures(docs, 64).count())
    time("sigs2")(Dedup.minhashSignatures(docs, 64).count())
    time("candidates")(Dedup.minhashCandidates(docs, 64, 32).count())
    time("minhashPairs")(Dedup.minhashPairs(docs, 0.5).count())
    time("simhash")(Dedup.simhash(docs).count())
    time("simhashPairs")(Dedup.simhashPairs(docs, 3).count())
    time("jaccardPairs")(Dedup.jaccardPairs(docs, 0.5).count())
    spark.stop()
  }
}
