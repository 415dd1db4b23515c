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
 * interpreter overhead. These expressions compute everything in ONE walk
 * over the UTF8String's raw UTF-8 BYTES — no per-row String copy, no
 * allocation beyond the output row — codegen'd via a static kernel call
 * (so whole-stage codegen's subexpression elimination also dedupes
 * repeated struct-field uses into a single scan per row).
 *
 * Both kernels tokenize through the same two helpers ([[tokenHit]] for
 * membership, the space-byte boundary rules of [[foreachToken]]) so the
 * tokenizers cannot drift apart; `ExpressionProps` pins them to each other
 * (metrics.n_stop === listHits([stopwords])[0]) and to the declarative
 * originals property-wise, including astral (surrogate-pair) inputs.
 *
 * Semantics are pinned to the declarative originals (and the DuckDB
 * oracle twins) exactly:
 *  - chars   = Unicode code points (Spark `length`, DuckDB `length`) —
 *              counted as non-continuation bytes; a 4-byte emoji is 1;
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

  /** Token-in-wordlist test on s's byte range [from, until) without
   * allocating — wordlists are pre-encoded UTF-8 byte arrays, so equality
   * is a straight byte compare regardless of script. */
  private def tokenHit(s: UTF8String, from: Int, until: Int, words: Array[Array[Byte]]): Boolean = {
    val len = until - from
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.length == len) {
        var j = 0
        while (j < len && s.getByte(from + j) == word(j)) j += 1
        if (j == len) return true
      }
      w += 1
    }
    false
  }

  /** THE tokenizer: invoke f(fromByte, untilByte) for every maximal run of
   * non-0x20 bytes. Space is ASCII so the test is byte-exact in UTF-8
   * (0x20 never appears inside a multi-byte sequence). */
  private def foreachToken(s: UTF8String, f: (Int, Int) => Unit): Unit = {
    val nb = s.numBytes
    var i = 0
    var tokStart = -1
    while (i < nb) {
      if (s.getByte(i) == ' ') {
        if (tokStart >= 0) { f(tokStart, i); tokStart = -1 }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    if (tokStart >= 0) f(tokStart, nb)
  }

  /** One-pass kernel shared by eval and codegen (static call target).
   * Walks raw UTF-8: ASCII bytes carry all class tests; a negative byte
   * is a non-ASCII leading byte (counts one char, one bpe "other", token
   * char) and its continuation bytes are skipped by sequence length. */
  def scanMetrics(input: UTF8String, stopwords: Array[Array[Byte]]): InternalRow = {
    val nb = input.numBytes
    var nChars = 0; var nWords = 0; var nPunct = 0; var nStop = 0; var nBpe = 0
    var tokStart = -1
    var inLetters = false; var inDigits = false
    var i = 0
    while (i < nb) {
      val b = input.getByte(i)
      if (b >= 0) { // ASCII
        nChars += 1
        if (b == ' ') {
          if (tokStart >= 0) { // token ends: same boundary rule as foreachToken
            nWords += 1
            if (tokenHit(input, tokStart, i, stopwords)) nStop += 1
            tokStart = -1
          }
          inLetters = false; inDigits = false
        } else {
          if (tokStart < 0) tokStart = i
          if (b == '.' || b == ',' || b == '!' || b == '?' || b == ';' || b == ':')
            nPunct += 1
          val isLetter = (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
          val isDigit = b >= '0' && b <= '9'
          if (isLetter) { if (!inLetters) nBpe += 1; inLetters = true; inDigits = false }
          else if (isDigit) { if (!inDigits) nBpe += 1; inDigits = true; inLetters = false }
          else { nBpe += 1; inLetters = false; inDigits = false }
        }
        i += 1
      } else { // non-ASCII leading byte: one code point (incl. astral), "other" for bpe
        nChars += 1
        if (tokStart < 0) tokStart = i
        nBpe += 1; inLetters = false; inDigits = false
        i += (if ((b & 0xE0) == 0xC0) 2 else if ((b & 0xF0) == 0xE0) 3 else 4)
      }
    }
    if (tokStart >= 0) {
      nWords += 1
      if (tokenHit(input, tokStart, nb, stopwords)) nStop += 1
    }
    InternalRow(nChars, nWords, nPunct, nStop, nBpe)
  }

  /** Per-wordlist token hit counts in one pass (static call target). */
  def scanListHits(input: UTF8String, lists: Array[Array[Array[Byte]]]): GenericArrayData = {
    val hits = new Array[Int](lists.length)
    foreachToken(input, (from, until) => {
      var l = 0
      while (l < lists.length) {
        if (tokenHit(input, from, until, lists(l))) hits(l) += 1
        l += 1
      }
    })
    new GenericArrayData(hits)
  }

  private def utf8(words: Seq[String]): Array[Array[Byte]] =
    words.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  case class TextMetricsScan(child: Expression, stopwords: Seq[String])
      extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = metricsType
    override def prettyName: String = "text_metrics_scan"
    private lazy val words = utf8(stopwords)

    override protected def nullSafeEval(input: Any): Any =
      scanMetrics(input.asInstanceOf[UTF8String], words)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val ref = ctx.addReferenceObj("stopwords", words, "byte[][]")
        s"${ev.value} = graft.functions.TextScanOps.scanMetrics($a, $ref);"
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class TokenListHits(child: Expression, lists: Seq[Seq[String]])
      extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "token_list_hits"
    private lazy val arrays = lists.map(utf8).toArray

    override protected def nullSafeEval(input: Any): Any =
      scanListHits(input.asInstanceOf[UTF8String], arrays)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val ref = ctx.addReferenceObj("lists", arrays, "byte[][][]")
        s"${ev.value} = graft.functions.TextScanOps.scanListHits($a, $ref);"
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def metrics(text: Column, stopwords: Seq[String]): Column =
    GraftBridge.column(TextMetricsScan(GraftBridge.expression(text), stopwords))

  def listHits(text: Column, lists: Seq[Seq[String]]): Column =
    GraftBridge.column(TokenListHits(GraftBridge.expression(text), lists))
}
