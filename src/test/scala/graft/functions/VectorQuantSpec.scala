package graft.functions

import graft.SparkSpec
import graft.llm.Similarity
import org.apache.spark.sql.functions._

class VectorQuantSpec extends SparkSpec {

  test("int8 quantize/dequantize round-trip error bounded by scale/2 per element") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.5f, -1.25f, 3.75f, 0.0f)),
      (2L, Array(100.0f, -100.0f, 50.0f, 1.0f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("id", "v")
    val rt = vecs.select(col("id"), col("v"),
      VectorQuant.dequantize(VectorQuant.quantize(col("v"))).as("rt"),
      VectorQuant.quantize(col("v")).getField("scale").as("scale"))
    rt.collect().foreach { r =>
      val orig = r.getSeq[Float](1)
      val back = r.getSeq[Double](2)
      val scale = r.getDouble(3)
      orig.zip(back).foreach { case (o, b) =>
        assert(math.abs(o.toDouble - b) <= scale / 2 + 1e-12,
          s"round-trip error too large: $o vs $b (scale $scale)")
      }
    }
  }

  test("quantized ANN: top-k on int8 dot products matches float ranking on the test corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0).select(
      VectorQuant.quantize(col("embedding")).as("_qq"),
      col("embedding").as("_qv"))
    val joined = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
        VectorQuant.dotQuantized(VectorQuant.quantize(col("embedding")), col("_qq")).as("qdot"),
        Similarity.dot(Similarity.asDouble(col("embedding")),
          Similarity.asDouble(col("_qv"))).as("fdot"))
    val top = joined.orderBy(col("fdot").desc).limit(10).collect()
    val topQ = joined.orderBy(col("qdot").desc).limit(10).collect()
    val exactIds = top.map(_.getLong(0)).toSet
    val quantIds = topQ.map(_.getLong(0)).toSet
    // int8 candidate generation recalls ≥ 8/10 of the float top-10 here
    assert((exactIds intersect quantIds).size >= 8,
      s"quantized recall too low: $quantIds vs $exactIds")
    // and relative dot-product error is small
    joined.collect().foreach { r =>
      val (qd, fd) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(qd - fd) <= 0.05 * math.max(1.0, math.abs(fd)) + 0.5)
    }
  }
}
