package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LanguageModelSpec extends SparkSpec {

  test("bigramRarity: unique transitions score rare; formulaic text scores fluent") {
    import spark.implicits._
    // 20 copies of the same sentence = every transition is high-probability;
    // the outlier hangs rare continuations off the COMMON prefix 'the'
    // (rarity is conditional: a rare bigram after a rare prefix is not
    // surprising, a rare bigram after a common prefix is)
    val fluent = (1L to 20L).map(i => (i, "the cat sat on the mat"))
    val weird = Seq((99L, "the zzz the qqq"))
    val docs = (fluent ++ weird).toDF("doc_id", "text")
    val out = LanguageModel.bigramRarity(docs, minP = 0.03).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_rare"),
         r.getAs[Double]("min_p"), r.getAs[Double]("rare_frac")))
      .toMap
    // 'the' is a prefix 42x: 20x cat, 20x mat, 1x zzz, 1x qqq
    val (nb, nRare, minP, rareFrac) = out(99L)
    assert(nb == 3) // (the,zzz) (zzz,the) (the,qqq)
    assert(nRare == 2 && minP == 1.0 / 42.0 && rareFrac == 2.0 / 3.0,
      s"nRare=$nRare minP=$minP rareFrac=$rareFrac")
    val (nbF, nRareF, minPF, _) = out(1L)
    assert(nbF == 5)
    // fluent transitions: 'the'→cat/mat at 20/42, all others 20/20
    assert(nRareF == 0L && minPF == 20.0 / 42.0)
  }

  test("bigramRarity: probability cut is corpus-size invariant (counts cut would not be)") {
    import spark.implicits._
    def corpus(mult: Int) =
      ((1 to (10 * mult)).map(i => (i.toLong, "a b a b c")) ++
       (0 until mult).map(i => (100000L + i, "q r q"))).toDF("doc_id", "text")
    def rareOf(mult: Int): Map[Long, Double] =
      LanguageModel.bigramRarity(corpus(mult), minP = 0.03).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rare_frac")).toMap
    val r1 = rareOf(1)
    val r10 = rareOf(10)
    // replicating the corpus 10x leaves every conditional probability — and
    // hence every rarity verdict — unchanged
    assert(r1(1L) == r10(1L) && r1(100000L) == r10(100000L))
  }

  test("bigramRarity: docs with fewer than two tokens drop out (no bigrams)") {
    import spark.implicits._
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "two tokens")).toDF("doc_id", "text")
    val ids = LanguageModel.bigramRarity(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(3L))
  }
}
