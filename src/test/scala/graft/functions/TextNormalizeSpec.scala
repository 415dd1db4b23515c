package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class TextNormalizeSpec extends SparkSpec {

  private def norm(s: String): String =
    TextNormalize.normalize(UTF8String.fromString(s)).toString

  test("kernel: lowercase + collapse + trim semantics, edge cases") {
    assert(norm("") == "")
    assert(norm("   ") == "")
    assert(norm("\t\n\r") == "")
    assert(norm("a") == "a")
    assert(norm("  Hello\t WORLD \n") == "hello world")
    assert(norm("a  b\tc\r\nd") == "a b c d")
    assert(norm("AbC") == "abc")
    // reference spelling over random-ish mixes
    val cases = Seq("x  Y\tz", " lead", "trail ", "A\n\nB", "mIxEd CaSe  wOrDs\t")
    for (c <- cases) {
      val want = c.toLowerCase.replaceAll("[ \t\n\r]+", " ").trim
      assert(norm(c) == want, s"input=${c.replace("\n", "\\n")}")
    }
  }

  test("kernel: non-ASCII bytes pass through untouched (UTF-8-safe, no Unicode lowering)") {
    assert(norm("Émile  ét udié") == "Émile ét udié") // É stays upper: ASCII-only lowering
    assert(norm("日本\t語") == "日本 語")
    assert(norm("a💡B") == "a💡b") // astral char preserved, ASCII B lowered
  }

  test("kernel: already-normalized input returns the input object (zero-alloc fast path)") {
    val in = UTF8String.fromString("already clean text")
    assert(TextNormalize.normalize(in) eq in)
    val dirty = UTF8String.fromString("Not Clean")
    assert(!(TextNormalize.normalize(dirty) eq dirty))
    // single-token and empty inputs are clean
    val one = UTF8String.fromString("token")
    assert(TextNormalize.normalize(one) eq one)
    val empty = UTF8String.fromString("")
    assert(TextNormalize.normalize(empty) eq empty)
  }

  test("codegen and interpreted paths agree; codegen'd plan stays whole-stage") {
    import spark.implicits._
    val df = Seq("  A  b\tC ", "clean", "", " \t ", "Über  Groß", "x").toDF("t")
      .select(col("t"), TextNormalize.normalizeText(col("t")).as("n"))
    val withCodegen = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = Seq("  A  b\tC ", "clean", "", " \t ", "Über  Groß", "x").toDF("t")
        .select(col("t"), TextNormalize.normalizeText(col("t")).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(withCodegen == interp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val plan = spark.range(4)
      .select(TextNormalize.normalizeText(concat(lit("X "), col("id"))))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a whole-stage-codegen'd span in simpleString
    assert(plan.contains("*(1) Project"), s"normalize must not break codegen; plan:\n$plan")
  }

  test("bm25: scores rank term-bearing docs first, fixed-order sum, broadcast stats") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark runs fast"),
      (2L, "spark joins tables"),
      (3L, "nothing relevant here at all whatsoever today"),
      (4L, "vector vector search")).toDF("doc_id", "text")
    val out = graft.llm.Relevance.bm25(docs, Seq("spark", "vector"), k = 4)
    val rows = out.collect()
    val byId = rows.map(r => r.getLong(0) -> r.getDouble(rows.head.length - 1)).toMap
    assert(byId(1L) > byId(2L), "higher tf ranks higher for same term")
    assert(byId(3L) == 0.0, "no query terms → zero score")
    assert(byId(4L) > 0.0)
    // top-1 is doc 1 or 4 (rare-term idf may outweigh tf) but never 3
    assert(rows.head.getLong(0) != 3L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"corpus stats must broadcast, got:\n$plan")
  }
}
