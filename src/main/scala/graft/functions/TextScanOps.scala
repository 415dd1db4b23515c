package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused single-pass text scanners.
 *
 * The declarative formulations of the text metrics re-scan the document
 * once PER METRIC — `split` allocates a token array, `filter`/`transform`
 * lambdas are interpreted per token (HOFs don't codegen), and
 * `regexp_count` walks a regex automaton per char. Five metrics over a
 * 100 TB corpus = five string scans plus per-row regex and per-token
 * interpreter overhead. These expressions compute everything in ONE
 * character walk with zero per-row allocation beyond the output row —
 * narrow map, column-prunes to `text`, codegen'd via a static kernel call
 * (so whole-stage codegen's subexpression elimination also dedupes
 * repeated struct-field uses into a single scan per row).
 *
 * Semantics are pinned to the declarative originals (and the DuckDB
 * oracle twins) exactly:
 *  - chars   = Unicode code points (Spark `length`, DuckDB `length`);
 *  - words   = maximal runs of non-space (split " +" with empties dropped;
 *              ONLY 0x20 is a separator — tabs/newlines are token chars);
 *  - punct   = chars in [.,!?;:];
 *  - stop    = tokens equal (case-sensitive) to a wordlist entry;
 *  - bpe     = leftmost-greedy [A-Za-z]+|[0-9]+|[^A-Za-z0-9 ] match count
 *              (letter runs + digit runs + one per other non-space char).
 */
object TextScanOps {

  private val metricsType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_bpe", IntegerType, nullable = false)))

  /** Token-in-wordlist test on s[from, until) without allocating. */
  private def tokenHit(s: String, from: Int, until: Int, words: Array[String]): Boolean = {
    val len = until - from
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.length == len && s.regionMatches(from, word, 0, len)) return true
      w += 1
    }
    false
  }

  /** One-pass kernel shared by eval and codegen (static call target). */
  def scanMetrics(input: UTF8String, stopwords: Array[String]): InternalRow = {
    val s = input.toString
    val n = s.length
    var nChars = 0; var nWords = 0; var nPunct = 0; var nStop = 0; var nBpe = 0
    var tokStart = -1
    var inLetters = false; var inDigits = false
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      nChars += 1
      if (cp == ' ') {
        if (tokStart >= 0) {
          nWords += 1
          if (tokenHit(s, tokStart, i, stopwords)) nStop += 1
          tokStart = -1
        }
        inLetters = false; inDigits = false
      } else {
        if (tokStart < 0) tokStart = i
        if (cp == '.' || cp == ',' || cp == '!' || cp == '?' || cp == ';' || cp == ':')
          nPunct += 1
        val isLetter = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')
        val isDigit = cp >= '0' && cp <= '9'
        if (isLetter) { if (!inLetters) nBpe += 1; inLetters = true; inDigits = false }
        else if (isDigit) { if (!inDigits) nBpe += 1; inDigits = true; inLetters = false }
        else { nBpe += 1; inLetters = false; inDigits = false }
      }
      i += Character.charCount(cp)
    }
    if (tokStart >= 0) {
      nWords += 1
      if (tokenHit(s, tokStart, n, stopwords)) nStop += 1
    }
    InternalRow(nChars, nWords, nPunct, nStop, nBpe)
  }

  /** Per-wordlist token hit counts in one pass (static call target). */
  def scanListHits(input: UTF8String, lists: Array[Array[String]]): GenericArrayData = {
    val s = input.toString
    val n = s.length
    val hits = new Array[Int](lists.length)
    var tokStart = -1
    var i = 0
    while (i <= n) {
      val atSpace = i == n || s.charAt(i) == ' '
      if (atSpace) {
        if (tokStart >= 0) {
          var l = 0
          while (l < lists.length) {
            if (tokenHit(s, tokStart, i, lists(l))) hits(l) += 1
            l += 1
          }
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    new GenericArrayData(hits)
  }

  case class TextMetricsScan(child: Expression, stopwords: Seq[String])
      extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = metricsType
    override def prettyName: String = "text_metrics_scan"
    private lazy val words = stopwords.toArray

    override protected def nullSafeEval(input: Any): Any =
      scanMetrics(input.asInstanceOf[UTF8String], words)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val ref = ctx.addReferenceObj("stopwords", words, "java.lang.String[]")
        s"${ev.value} = graft.functions.TextScanOps.scanMetrics($a, $ref);"
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class TokenListHits(child: Expression, lists: Seq[Seq[String]])
      extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "token_list_hits"
    private lazy val arrays = lists.map(_.toArray).toArray

    override protected def nullSafeEval(input: Any): Any =
      scanListHits(input.asInstanceOf[UTF8String], arrays)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val ref = ctx.addReferenceObj("lists", arrays, "java.lang.String[][]")
        s"${ev.value} = graft.functions.TextScanOps.scanListHits($a, $ref);"
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def metrics(text: Column, stopwords: Seq[String]): Column =
    GraftBridge.column(TextMetricsScan(GraftBridge.expression(text), stopwords))

  def listHits(text: Column, lists: Seq[Seq[String]]): Column =
    GraftBridge.column(TokenListHits(GraftBridge.expression(text), lists))
}
