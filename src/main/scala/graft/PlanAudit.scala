package graft

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for key queries (scale/pushdown audit). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // bench parity: without this the driver parquet's ns timestamps read as
    // TimestampNTZ, which pushes schema-gated fused encodes onto their
    // builtin fallback — the audited plan is then NOT the benched plan
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val targets = args.toSeq match {
      case Nil => Seq("q2_filter_project", "q3_join_topn", "q1_pricing_summary",
        "cdc_filter", "cdc_upsert", "dedup_minhash", "ann_topk")
      case xs => xs
    }
    targets.foreach { name =>
      println(s"\n======== $name ========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
