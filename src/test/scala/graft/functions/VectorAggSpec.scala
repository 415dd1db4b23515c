package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorAggSpec extends SparkSpec {

  test("vector_sum: element-wise sum over array<float>, nulls skipped") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (1L, Array(0.5f, -2.0f, 1.0f)),
      (2L, Array(10.0f, 20.0f, 30.0f)))
      .toDF("g", "v")
      .union(Seq((1L, null.asInstanceOf[Array[Float]])).toDF("g", "v"))
    val out = df.groupBy("g").agg(VectorAgg.vectorSum(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(1L).zip(Seq(1.5, 0.0, 4.0)).forall { case (a, b) => math.abs(a - b) < 1e-6 })
    assert(out(2L).zip(Seq(10.0, 20.0, 30.0)).forall { case (a, b) => math.abs(a - b) < 1e-6 })
  }

  test("vector_sum: array<double> input, all-null group yields null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(1.5, 2.5))),
      (1L, Some(Seq(0.5, 0.5))),
      (2L, Option.empty[Seq[Double]]))
      .toDF("g", "v")
    val rows = df.groupBy("g").agg(VectorAgg.vectorSum(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(1L).map(_.asInstanceOf[scala.collection.Seq[Double]].toSeq).get == Seq(2.0, 3.0))
    assert(rows(2L).isEmpty) // nothing seen — null, not a zero vector
  }

  test("vector_sum: ragged dims raise (corrupt corpus, never silently averaged)") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 2.0)), (1L, Seq(1.0, 2.0, 3.0))).toDF("g", "v")
    val ex = intercept[Exception] {
      df.groupBy("g").agg(VectorAgg.vectorSum(col("v")).as("s")).collect()
    }
    assert(ex.getMessage.contains("ragged") ||
      Option(ex.getCause).exists(_.getMessage.contains("ragged")))
  }

  test("vector_sum: map-side partial aggregation — plan shows partial+final, exchange carries groups not rows") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i % 4L, Array.fill(8)(1.0f))).toDF("g", "v")
      .repartition(8)
    val agg = df.groupBy("g").agg(VectorAgg.vectorSum(col("v")).as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    // TypedImperativeAggregate runs as ObjectHashAggregate partial/final
    assert(plan.contains("ObjectHashAggregate"))
    assert(agg.collect().forall(_.getSeq[Double](1).forall(x => math.abs(x - 250.0) < 1e-9)))
  }
}
