package graft.llm

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  test("trainMerges: hand-computed merges on the classic low/lower/lowest corpus") {
    import spark.implicits._
    // words: low x3, lower x1, lowest x1
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, k = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // pair counts: (l,o)=5 (o,w)=5 tie -> 'l o' < 'o w' wins; then (lo,w)=5;
    // then (low,e)=2; then count-1 tie -> 'lowe r' < 'lowe s' < 's t'
    assert(merges.toSeq == Seq(
      (1, "l", "o", "lo", 5L),
      (2, "lo", "w", "low", 5L),
      (3, "low", "e", "lowe", 2L),
      (4, "lowe", "r", "lower", 1L)))
  }

  test("encodeWord: applies merges in rank order, leftmost-greedy") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "e"))
    assert(Bpe.encodeWord("lowest", merges) == Seq("lowe", "s", "t"))
    assert(Bpe.encodeWord("low", merges) == Seq("low"))
    assert(Bpe.encodeWord("wool", merges) == Seq("w", "o", "o", "l"))
    // leftmost-greedy within one merge: 'aaa' with (a,a)->aa merges the
    // FIRST two, leaving aa + a (never a + aa)
    assert(Bpe.encodeWord("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
    // chained merges compose
    assert(Bpe.encodeWord("aaaa", Seq(("a", "a"), ("aa", "aa"))) == Seq("aaaa"))
  }

  test("trainMerges: adjacent same-pair runs merge like classic BPE (aaaa -> [aa][aa])") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, k = 2).collect()
      .map(r => (r.getString(3), r.getLong(4)))
    // (a,a) appears 3x per word (overlapping, as classic get_stats counts),
    // weighted by 2 words = 6; after the merge each word is [aa][aa], so
    // (aa,aa) = 2 — which requires the run to have merged pairwise, not [aa][a][a]
    assert(merges.toSeq == Seq(("aa", 6L), ("aaaa", 2L)))
  }

  test("trainMerges: k larger than the reachable merge count stops cleanly") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // only one pair exists: (a,b). After merging, vocab is single-symbol;
    // no pairs remain and training stops early with 1 merge.
    val merges = Bpe.trainMerges(docs, k = 5).collect()
    assert(merges.length == 1)
    assert(merges(0).getString(3) == "ab" && merges(0).getLong(4) == 2L)
  }
}
