package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {

  private lazy val corpus = {
    import spark.implicits._
    val target = (0L to 4L).map(i =>
      (i, s"quantum physics entanglement superposition qubit decoherence paper $i", "tgt"))
    val onTopic = (10L to 14L).map(i =>
      (i, s"quantum entanglement and qubit decoherence in physics experiments run $i", "raw"))
    val offTopic = (20L to 24L).map(i =>
      (i, s"football match score goal referee stadium crowd season game $i", "raw"))
    (target ++ onTopic ++ offTopic).toDF("doc_id", "text", "source")
  }

  test("DSIR weights rank target-like docs above off-topic docs") {
    val w = Dsir.importanceWeights(corpus, isTarget = col("source") === "tgt",
      buckets = 256)
    val rows = w.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("logw")).toMap
    // only raw docs are scored
    assert(rows.keySet == ((10L to 14L) ++ (20L to 24L)).toSet)
    val minOn = (10L to 14L).map(rows).min
    val maxOff = (20L to 24L).map(rows).max
    assert(minOn > maxOff,
      s"every on-topic weight ($minOn) should beat every off-topic weight ($maxOff)")
    // n_feats = unigrams + bigrams with multiplicity = 2*len - 1
    // (doc 10 has 10 whitespace tokens)
    val nf = w.filter(col("doc_id") === 10L).select("n_feats").head().getLong(0)
    assert(nf == 2L * 10 - 1)
  }

  test("fused importanceWeights == the exploded join+agg shape, row for row") {
    import graft.functions.TextHashOps
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    // the r14 exploded shape, inlined as the oracle: md5-60 uni+bigram
    // occurrence stream -> one groupBy model pass -> broadcast llr join ->
    // per-doc decimal sum. The fused rewrite must reproduce every value
    // bit-for-bit (same double log chain, same HALF_UP rounds).
    val buckets = 256
    val isTarget = col("source") === "tgt"
    def explodedOracle = {
      val feats = corpus
        .select(col("doc_id"), isTarget.as("t"),
          explode(concat(
            TextHashOps.md5Hash60Array(TextHashOps.textNgramsAll(col("text"), 1)),
            TextHashOps.md5Hash60Array(TextHashOps.textNgramsAll(col("text"), 2))))
            .as("h"))
        .select(col("doc_id"), col("t"), pmod(col("h"), lit(buckets.toLong)).as("b"))
      val counts = feats.groupBy("b").agg(
        sum(when(col("t"), 1L).otherwise(0L)).as("ct"),
        sum(when(!col("t"), 1L).otherwise(0L)).as("cr"))
        .localCheckpoint(true)
      val tots = counts.agg(sum(col("ct")).as("tn"), sum(col("cr")).as("rn"))
      val llr = counts.crossJoin(broadcast(tots))
        .select(col("b"),
          round(
            log((col("ct") + lit(1)).cast(DoubleType) /
              (col("tn") + lit(buckets)).cast(DoubleType)) -
            log((col("cr") + lit(1)).cast(DoubleType) /
              (col("rn") + lit(buckets)).cast(DoubleType)), 9)
            .cast(DecimalType(28, 10)).as("llr"))
      val perDoc = feats.filter(!col("t")).join(broadcast(llr), "b")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_feats"), sum(col("llr")).as("w"))
      corpus.filter(!isTarget).select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_feats"), lit(0L)).as("n_feats"),
          round(coalesce(col("w"), lit(0)).cast(DoubleType), 4).as("logw"))
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val fused = rows(Dsir.importanceWeights(corpus, isTarget, buckets))
    val oracle = rows(explodedOracle)
    assert(fused == oracle, s"fused/exploded divergence:\n$fused\nvs\n$oracle")
  }

  test("Gumbel top-k is deterministic, size-k, and importance-biased") {
    val w = Dsir.importanceWeights(corpus, isTarget = col("source") === "tgt",
      buckets = 256)
    val s1 = Dsir.gumbelTopK(w, k = 5, seed = 29).collect()
    val s2 = Dsir.gumbelTopK(w, k = 5, seed = 29).collect()
    assert(s1.map(_.getLong(0)).toSeq == s2.map(_.getLong(0)).toSeq) // deterministic
    assert(s1.length == 5)
    // weights differ by many nats between the topic groups, so Gumbel
    // noise (scale ~1) cannot promote off-topic docs into the top 5
    assert(s1.map(_.getLong(0)).forall(id => id >= 10L && id <= 14L))
    // scores descend in emitted order
    val scores = s1.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse)
  }
}
