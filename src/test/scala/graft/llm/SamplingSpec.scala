package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"s${i % 5}", s"text $i")).toDF("doc_id", "stratum", "text")
  }

  test("stratified: deterministic, repartition-invariant, rate-accurate, drops unlisted strata") {
    val d = docs(5000)
    val rates = Map("s0" -> 1.0, "s1" -> 0.5, "s2" -> 0.1) // s3,s4 unlisted
    val a = Sampling.stratified(d, "stratum", rates, seed = 7)
    val b = Sampling.stratified(d.repartition(13), "stratum", rates, seed = 7)
    val ka = a.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ka == b.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq,
      "sample membership must not depend on physical layout")
    val byStratum = a.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum.keySet == Set("s0", "s1", "s2"))
    assert(byStratum("s0") == 1000L, "rate 1.0 keeps everything")
    // 1000 rows per stratum; hash-thresholding binomial, ~4σ tolerance
    assert(math.abs(byStratum("s1") - 500L) < 70, s"s1=${byStratum("s1")}")
    assert(math.abs(byStratum("s2") - 100L) < 45, s"s2=${byStratum("s2")}")
    // a different seed selects a materially different subset at rate 0.5
    val a2 = Sampling.stratified(d, "stratum", rates, seed = 8)
      .filter(col("stratum") === "s1").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val a1 = a.filter(col("stratum") === "s1").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert((a1 -- a2).nonEmpty && (a2 -- a1).nonEmpty)
  }

  test("bottomK: exactly min(k, |stratum|) rows per stratum, the k globally-smallest hashes") {
    val d = docs(500) // 100 per stratum
    val out = Sampling.bottomK(d, "stratum", k = 7, seed = 11).cache()
    val sizes = out.groupBy("stratum").count().collect().map(_.getLong(1)).toSeq
    assert(sizes == Seq.fill(5)(7L))
    // tiny stratum: k larger than the stratum keeps everything
    val tiny = Sampling.bottomK(docs(3), "stratum", k = 10, seed = 11)
    assert(tiny.count() == 3)
    // membership = bottom-7 of the full per-stratum hash order (merge
    // property: the sample of the whole equals the sample computed here)
    val all = d.withColumn("h", Sampling.hashOrd(col("doc_id"), 11))
      .collect().map(r => (r.getString(1), r.getLong(3), r.getLong(0)))
    val expect = all.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._2, r._3)).take(7).toSeq
    }.map(_._3).toSet
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == expect)
    out.unpersist()
  }

  test("bottomK plan: rank filter is pushed into a map-side WindowGroupLimit partial top-k") {
    val plan = Sampling.bottomK(docs(100), "stratum", k = 5, seed = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit partial top-k before the exchange, got:\n$plan")
  }

  test("mixCorpus: output proportions approach targets; feasibility bound respected") {
    import spark.implicits._
    // skewed corpus: s0 huge, s2 scarce — s2 is the binding constraint
    val d = ((0 until 6000).map(i => (i.toLong, "s0")) ++
             (6000 until 8000).map(i => (i.toLong, "s1")) ++
             (8000 until 8500).map(i => (i.toLong, "s2")))
      .toDF("doc_id", "domain")
    val out = Sampling.mixCorpus(d, "domain", Map("s0" -> 0.5, "s1" -> 0.3, "s2" -> 0.2), seed = 3)
      .cache()
    val got = out.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // n_total = min(6000/.5, 2000/.3, 500/.2) = 2500 → expect 1250/750/500
    assert(got("s2") == 500L, "binding domain keeps everything (rate 1.0)")
    assert(math.abs(got("s0") - 1250L) < 140, s"s0=${got("s0")}")
    assert(math.abs(got("s1") - 750L) < 110, s"s1=${got("s1")}")
    // no upsampling ever: each domain's output <= its input
    assert(got.values.sum <= 8500L)
    out.unpersist()
  }

  test("deterministicShuffle: (shard,pos) is a complete permutation, stable across layouts") {
    val d = docs(2000)
    val s1 = Sampling.deterministicShuffle(d, shards = 8, seed = 5)
      .select("doc_id", "shard", "pos").cache()
    // every row appears exactly once; positions within a shard are 1..n
    assert(s1.count() == 2000)
    assert(s1.select("doc_id").distinct().count() == 2000)
    val shardChecks = s1.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .collect()
    shardChecks.foreach { r =>
      assert(r.getAs[Int]("mn") == 1 && r.getAs[Int]("mx").toLong == r.getAs[Long]("n"),
        s"shard ${r.get(0)}: positions must be dense 1..n")
    }
    // layout-invariant: same permutation from a repartitioned input
    val s2 = Sampling.deterministicShuffle(d.repartition(17), shards = 8, seed = 5)
      .select("doc_id", "shard", "pos")
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    // the order is not the identity order (it actually shuffles)
    val firstShardIds = s1.filter(col("shard") === 0).orderBy("pos")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(firstShardIds != firstShardIds.sorted)
    s1.unpersist()
  }
}
