package graft.functions

import graft.SparkSpec
import graft.llm.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Fused text scanners through the FULL Spark path (whole-stage codegen, not
 * just interpreted eval — ExpressionProps covers that): the fused metrics
 * struct and wordlist hits must agree with the declarative split/regex
 * formulations on every row, including empty/space-only/unicode/tab edges.
 */
class TextScanSpec extends SparkSpec {

  private val fixtures = Seq(
    "",
    " ",
    "    ",
    "the",
    " the ",
    "the quick brown fox, and a dog; it is... fine!",
    "a1b2c3 x!y?z 12 345 ab12cd",
    "tabs\tare token chars",
    "unicode é ü tokens",
    "a💡b surrogate pair", // astral codepoint inside a token
    "der die und el la le les des of to in",
    "..!!??;;::..",
    "   leading and trailing   ")

  test("fused metrics struct equals declarative metrics on edge-case rows") {
    import spark.implicits._
    val df = fixtures.zipWithIndex.map(_.swap).toDF("id", "text")
    val t = col("text")
    val m = TextAnalysis.metrics(t)
    val rows = df.select(
      m.getField("n_chars").cast(LongType).as("f_chars"),
      m.getField("n_words").cast(LongType).as("f_words"),
      m.getField("n_punct").cast(LongType).as("f_punct"),
      m.getField("n_stop").cast(LongType).as("f_stop"),
      m.getField("n_bpe").cast(LongType).as("f_bpe"),
      TextAnalysis.nChars(t).cast(LongType).as("l_chars"),
      TextAnalysis.nWords(t).cast(LongType).as("l_words"),
      TextAnalysis.nPunct(t).cast(LongType).as("l_punct"),
      TextAnalysis.nStopwords(t).cast(LongType).as("l_stop"),
      TextAnalysis.bpeTokenCount(t).cast(LongType).as("l_bpe"),
      t).collect()
    rows.foreach { r =>
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        (r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9)),
        s"fused != declarative for text '${r.getString(10)}'")
    }
  }

  test("fused langId equals the declarative per-list scores") {
    import spark.implicits._
    val df = fixtures.zipWithIndex.map(_.swap).toDF("id", "text")
    val t = col("text")
    // declarative reference: four interpreted split+filter scans
    val en = TextAnalysis.langScore(t, "en"); val es = TextAnalysis.langScore(t, "es")
    val de = TextAnalysis.langScore(t, "de"); val fr = TextAnalysis.langScore(t, "fr")
    val best = greatest(en, es, de, fr)
    val legacy = when(best === 0, "unknown")
      .when(en === best, "en").when(es === best, "es")
      .when(de === best, "de").otherwise("fr")
    val rows = df.select(TextAnalysis.langId(t).as("f"), legacy.as("l"), t).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"langId mismatch for '${r.getString(2)}'"))
  }

  test("fused qualityScore preserves the exact double arithmetic") {
    import spark.implicits._
    val df = fixtures.zipWithIndex.map(_.swap).toDF("id", "text")
    val t = col("text")
    // reference arithmetic on the declarative counts (the pre-fusion form)
    val w = TextAnalysis.nWords(t).cast("double")
    val punctRatio = TextAnalysis.nPunct(t).cast("double") /
      greatest(TextAnalysis.nChars(t).cast("double"), lit(1.0))
    val stopRatio = TextAnalysis.nStopwords(t).cast("double") / greatest(w, lit(1.0))
    val legacy = floor(greatest(lit(0.0), least(lit(1.0),
      lit(0.5) * least(w / lit(20.0), lit(1.0))
        + lit(0.3) * least(stopRatio * 5.0, lit(1.0))
        + lit(0.2) * (lit(1.0) - least(punctRatio * 10.0, lit(1.0))))) * 10000) / 10000
    val rows = df.select(TextAnalysis.qualityScore(t).as("f"), legacy.as("l"), t).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"quality mismatch for '${r.getString(2)}'"))
  }
}
