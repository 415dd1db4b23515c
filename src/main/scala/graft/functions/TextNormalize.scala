package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused text normalization: ASCII-lowercase + whitespace-collapse + trim
 * in ONE byte walk.
 *
 * The declarative spelling — `trim(regexp_replace(lower(text),
 * "[ \t\n\r]+", " "))` — costs a regex automaton walk plus up to three
 * intermediate string materializations per row, and `lower` is
 * locale/Unicode-sensitive (engine-dependent for non-ASCII). This kernel
 * does a single pass over the UTF8String's raw UTF-8 bytes:
 *
 *  - `A`-`Z` → `a`-`z` (ASCII only — deterministic across engines;
 *    non-ASCII bytes pass through UNTOUCHED, which is UTF-8-safe because
 *    lead/continuation bytes are all >= 0x80 and never match the ASCII
 *    tests);
 *  - runs of [space, \t, \n, \r] collapse to a single 0x20;
 *  - leading/trailing whitespace drops (trim);
 *  - the no-op case (already normalized) is detected in the same pass
 *    and returns the INPUT UTF8String — zero allocation for the common
 *    path of an already-clean corpus.
 *
 * Oracle twin (byte-identical by construction):
 * `trim(regexp_replace(translate(text, UPPER, lower), '[ \t\n\r]+', ' ', 'g'))`.
 */
object TextNormalize {

  /** Static kernel: shared by interpreted eval and codegen. */
  def normalize(input: UTF8String): UTF8String = {
    val nb = input.numBytes
    // pass 1 (cheap): is the input already normalized? (no uppercase, no
    // tab/CR/LF, no double/leading/trailing space)
    var clean = true
    var prevSpace = true // true at start ⇒ leading space is dirty
    var i = 0
    while (clean && i < nb) {
      val b = input.getByte(i)
      if (b == '\t' || b == '\n' || b == '\r') clean = false
      else if (b == ' ') { if (prevSpace) clean = false; prevSpace = true }
      else { if (b >= 'A' && b <= 'Z') clean = false; prevSpace = false }
      i += 1
    }
    if (clean && prevSpace && nb > 0) clean = false // trailing space
    if (clean) return input

    val out = new Array[Byte](nb)
    var o = 0
    var pendingSpace = false // a space to emit IF another token follows
    i = 0
    while (i < nb) {
      val b = input.getByte(i)
      if (b == ' ' || b == '\t' || b == '\n' || b == '\r') {
        if (o > 0) pendingSpace = true // leading whitespace never emits
      } else {
        if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
        out(o) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        o += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  case class NormalizeText(child: Expression) extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = StringType
    override def prettyName: String = "normalize_text"

    override protected def nullSafeEval(input: Any): Any =
      normalize(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextNormalize.normalize($a);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def normalizeText(text: Column): Column =
    GraftBridge.column(NormalizeText(GraftBridge.expression(text)))
}
