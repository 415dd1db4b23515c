package graft.functions

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused multi-path JSON extraction: parse the payload ONCE per row and pull
 * out every requested dotted path in a single streaming pass.
 *
 * The reference parses each event exactly once and then navigates the parsed
 * value per field (crates/processors/src/outbox.rs:111-244, filter dot-path
 * resolution crates/processors/src/filter.rs:265-271). The naive Spark
 * translation — one `get_json_object` per field — re-parses the full payload
 * per extraction (~10 parses/row in the outbox hot path). These expressions
 * restore the reference's parse-once cost model:
 *
 *   - [[JsonPathsGenerate]] — a `Generator` (shape of built-in `json_tuple`,
 *     but with dotted-path navigation). Used ahead of filters: generator
 *     outputs are attributes of a `Generate` node, so predicate pushdown can
 *     NEVER inline them back into N re-parses, while unrelated cheap gates
 *     (op/table) still push below it to the scan.
 *   - [[JsonPathsExtract]] — the scalar form (`array<string>`), for Project
 *     contexts (routing templates) where whole-stage codegen's common
 *     subexpression elimination guarantees one evaluation.
 *
 * Extraction semantics match `get_json_object`: scalar strings unescaped,
 * scalar numbers as their exact source literal (no double round-trip — the
 * number-fidelity invariant of SURVEY §7.4), booleans as `true`/`false`,
 * objects/arrays re-serialized compact (Jackson copy, byte-compatible with
 * `get_json_object`), JSON null / missing / non-object traversal → null.
 */
object JsonPathOps {

  private val factory = new JsonFactory()

  /**
   * Single-pass extraction of `paths` (pre-split dotted segments) from `json`.
   * Returns one string (or null) per path; first occurrence of a key wins.
   */
  def scan(json: String, paths: Array[Array[String]]): Array[String] = {
    val out = new Array[String](paths.length)
    if (json == null) return out
    val found = new Array[Boolean](paths.length)
    var remaining = paths.length
    try {
      val p = factory.createParser(json)
      try {
        if (p.nextToken() == JsonToken.START_OBJECT) {
          val maxDepth = paths.iterator.map(_.length).max
          val pathBuf = new Array[String](maxDepth)

          // walk an object whose START_OBJECT has been consumed; depth = #names on pathBuf
          def walk(depth: Int): Unit = {
            var tok = p.nextToken()
            while (tok == JsonToken.FIELD_NAME) {
              if (remaining == 0) return // caller stops too; parser state abandoned
              val name = p.currentName()
              val vTok = p.nextToken()
              if (depth < maxDepth) {
                pathBuf(depth) = name
                val m = matchIndex(pathBuf, depth + 1)
                val pfx = isPrefix(pathBuf, depth + 1)
                if (m >= 0) {
                  capture(m, vTok)
                  // overlap ("a" and "a.b" both requested): resolve the longer
                  // path from the captured raw text afterwards (rare path)
                  if (pfx && out(m) != null &&
                      (vTok == JsonToken.START_OBJECT)) resolveSuffixes(pathBuf, depth + 1, out(m))
                } else if (pfx && vTok == JsonToken.START_OBJECT) {
                  walk(depth + 1)
                } else if (vTok == JsonToken.START_OBJECT || vTok == JsonToken.START_ARRAY) {
                  p.skipChildren()
                }
              } else if (vTok == JsonToken.START_OBJECT || vTok == JsonToken.START_ARRAY) {
                p.skipChildren()
              }
              tok = p.nextToken()
            }
          }

          def matchIndex(buf: Array[String], len: Int): Int = {
            var i = 0
            while (i < paths.length) {
              if (!found(i) && paths(i).length == len && segEq(paths(i), buf, len)) return i
              i += 1
            }
            -1
          }

          def isPrefix(buf: Array[String], len: Int): Boolean = {
            var i = 0
            while (i < paths.length) {
              if (!found(i) && paths(i).length > len && segEq(paths(i), buf, len)) return true
              i += 1
            }
            false
          }

          def segEq(path: Array[String], buf: Array[String], len: Int): Boolean = {
            var j = 0
            while (j < len) { if (path(j) != buf(j)) return false; j += 1 }
            true
          }

          def capture(idx: Int, vTok: JsonToken): Unit = {
            captureValue(idx, vTok)
            // duplicate REQUESTED paths (callers usually dedupe, but the
            // scanner must not depend on it): propagate to every twin
            var j = 0
            while (j < paths.length) {
              if (j != idx && !found(j) && paths(j).length == paths(idx).length &&
                  segEq(paths(j), paths(idx), paths(idx).length)) {
                out(j) = out(idx)
                found(j) = true
                remaining -= 1
              }
              j += 1
            }
          }

          def captureValue(idx: Int, vTok: JsonToken): Unit = {
            vTok match {
              case JsonToken.VALUE_STRING | JsonToken.VALUE_NUMBER_INT |
                  JsonToken.VALUE_NUMBER_FLOAT => out(idx) = p.getText
              case JsonToken.VALUE_TRUE => out(idx) = "true"
              case JsonToken.VALUE_FALSE => out(idx) = "false"
              case JsonToken.VALUE_NULL => out(idx) = null // JSON null ⇒ SQL null
              case JsonToken.START_OBJECT | JsonToken.START_ARRAY =>
                // re-serialize compact via Jackson copy — byte-compatible with
                // get_json_object's object/array extraction
                val sw = new java.io.StringWriter()
                val gen = factory.createGenerator(sw)
                gen.copyCurrentStructure(p)
                gen.close()
                out(idx) = sw.toString
              case _ => out(idx) = null
            }
            found(idx) = true
            remaining -= 1
          }

          // longer paths hiding under a captured raw-object prefix: re-scan the fragment
          def resolveSuffixes(buf: Array[String], len: Int, fragment: String): Unit = {
            var i = 0
            while (i < paths.length) {
              if (!found(i) && paths(i).length > len && segEq(paths(i), buf, len)) {
                val sub = scan(fragment, Array(paths(i).drop(len)))
                out(i) = sub(0)
                found(i) = true
                remaining -= 1
              }
              i += 1
            }
          }

          walk(0)
        }
      } finally p.close()
    } catch {
      case _: Exception => // malformed JSON ⇒ all nulls, like get_json_object
    }
    out
  }

  private[functions] def splitPaths(paths: Seq[String]): Array[Array[String]] =
    paths.iterator.map(_.split('.').filter(_.nonEmpty)).toArray

  /** Scalar form: `array<string>` of extracted values, for Project contexts. */
  case class JsonPathsExtract(child: Expression, paths: Seq[String])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def nullable: Boolean = false
    override def prettyName: String = "json_paths"
    @transient private lazy val split = splitPaths(paths)

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      val json = if (v == null) null else v.toString
      val res = scan(json, split)
      new GenericArrayData(res.map(s => if (s == null) null else UTF8String.fromString(s)))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Generator form: one output row per input row, one string column per path. */
  case class JsonPathsGenerate(child: Expression, paths: Seq[String])
      extends Expression with Generator with CodegenFallback {
    override def children: Seq[Expression] = Seq(child)
    override def elementSchema: StructType =
      StructType(paths.zipWithIndex.map { case (_, i) =>
        StructField(s"c$i", StringType, nullable = true)
      })
    override def prettyName: String = "json_paths_tuple"
    @transient private lazy val split = splitPaths(paths)

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val v = child.eval(input)
      val json = if (v == null) null else v.toString
      val res = scan(json, split)
      Seq(InternalRow.fromSeq(res.toIndexedSeq.map(s =>
        if (s == null) null else UTF8String.fromString(s))))
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }

  /**
   * Typed single-parse scan of the TOP-LEVEL fields of a JSON object: for
   * each requested name, the value (same string semantics as [[scan]]) AND
   * its JSON type tag — `missing | null | int | float | bool | string |
   * object | array`. Optionally also collects the top-level keys NOT in
   * `names` (the "undeclared" set a drift detector needs), so schema
   * sensing reads everything it wants from ONE parse per row.
   *
   * Unlike `get_json_object`-based probing this preserves JSON quoting
   * (a quoted `"123"` tags as `string`, not `int` — the reference's
   * String-in-numeric-column mismatch, drift_detector.rs:346-412) and
   * distinguishes explicit JSON `null` (tag `null`) from an absent key
   * (tag `missing`) — the reference's UnexpectedNull fires only on the
   * former (drift_detector.rs observe_row).
   */
  case class JsonTopFieldsGenerate(child: Expression, names: Seq[String],
                                   collectUndeclared: Boolean)
      extends Expression with Generator with CodegenFallback {
    override def children: Seq[Expression] = Seq(child)
    override def elementSchema: StructType = StructType(
      names.indices.flatMap(i =>
        Seq(StructField(s"v$i", StringType, nullable = true),
          StructField(s"t$i", StringType, nullable = false))) ++
        (if (collectUndeclared)
          Seq(StructField("undeclared", ArrayType(StringType, containsNull = false),
            nullable = false))
        else Nil))
    override def prettyName: String = "json_top_fields"
    @transient private lazy val idx: Map[String, Int] =
      names.zipWithIndex.toMap
    // interned tag constants — this generator runs once per row on the
    // drift hot path; per-row UTF8String.fromString for fixed tags is waste
    @transient private lazy val tagU: Map[String, UTF8String] =
      Seq("missing", "null", "int", "float", "bool", "string", "object", "array")
        .map(t => t -> UTF8String.fromString(t)).toMap

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val v = child.eval(input)
      val n = names.length
      val values = new Array[String](n)
      val tags = Array.fill(n)("missing")
      val undecl = new scala.collection.mutable.ArrayBuffer[String]
      if (v != null) {
        try {
          val p = factory.createParser(v.toString)
          try {
            if (p.nextToken() == JsonToken.START_OBJECT) {
              var tok = p.nextToken()
              while (tok == JsonToken.FIELD_NAME) {
                val name = p.currentName()
                val vTok = p.nextToken()
                val i = idx.getOrElse(name, -1)
                if (i >= 0 && tags(i) == "missing") { // first occurrence wins
                  vTok match {
                    case JsonToken.VALUE_STRING =>
                      values(i) = p.getText; tags(i) = "string"
                    case JsonToken.VALUE_NUMBER_INT =>
                      values(i) = p.getText; tags(i) = "int"
                    case JsonToken.VALUE_NUMBER_FLOAT =>
                      values(i) = p.getText; tags(i) = "float"
                    case JsonToken.VALUE_TRUE => values(i) = "true"; tags(i) = "bool"
                    case JsonToken.VALUE_FALSE => values(i) = "false"; tags(i) = "bool"
                    case JsonToken.VALUE_NULL => tags(i) = "null"
                    case JsonToken.START_OBJECT | JsonToken.START_ARRAY =>
                      val sw = new java.io.StringWriter()
                      val gen = factory.createGenerator(sw)
                      gen.copyCurrentStructure(p)
                      gen.close()
                      values(i) = sw.toString
                      tags(i) = if (vTok == JsonToken.START_OBJECT) "object" else "array"
                    case _ => ()
                  }
                } else {
                  if (i < 0 && collectUndeclared) undecl += name
                  if (vTok == JsonToken.START_OBJECT || vTok == JsonToken.START_ARRAY)
                    p.skipChildren()
                }
                tok = p.nextToken()
              }
            }
          } finally p.close()
        } catch {
          case _: Exception => // malformed ⇒ everything missing, like get_json_object
            java.util.Arrays.fill(values.asInstanceOf[Array[AnyRef]], null)
            var i = 0; while (i < n) { tags(i) = "missing"; i += 1 }
            undecl.clear()
        }
      }
      val fields = new Array[Any](n * 2 + (if (collectUndeclared) 1 else 0))
      var i = 0
      while (i < n) {
        fields(2 * i) = if (values(i) == null) null else UTF8String.fromString(values(i))
        fields(2 * i + 1) = tagU(tags(i))
        i += 1
      }
      if (collectUndeclared)
        fields(n * 2) = new GenericArrayData(
          undecl.iterator.map(UTF8String.fromString).toArray[Any])
      Iterator.single(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fields))
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }

  /**
   * JSON-array membership with the reference filter's `json_eq` semantics
   * (crates/processors/src/filter.rs:185-198, :292-300): a string element
   * matches by string equality; a numeric element matches a numeric-looking
   * needle by numeric equality (42 == 42.0); number-vs-string NEVER matches
   * (no coercion). Non-array / malformed input → false.
   */
  case class JsonArrayContains(child: Expression, needle: String, numericNeedle: Boolean)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = org.apache.spark.sql.types.BooleanType
    override def nullable: Boolean = false
    override def prettyName: String = "json_array_contains"
    @transient private lazy val needleNum: Double =
      if (numericNeedle) needle.toDouble else Double.NaN

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return false
      try {
        val p = factory.createParser(v.toString)
        try {
          if (p.nextToken() != JsonToken.START_ARRAY) return false
          var tok = p.nextToken()
          while (tok != JsonToken.END_ARRAY && tok != null) {
            tok match {
              case JsonToken.VALUE_STRING if !numericNeedle =>
                if (p.getText == needle) return true
              case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT if numericNeedle =>
                if (p.getDoubleValue == needleNum) return true
              case JsonToken.START_OBJECT | JsonToken.START_ARRAY => p.skipChildren()
              case _ => ()
            }
            tok = p.nextToken()
          }
          false
        } finally p.close()
      } catch { case _: Exception => false }
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def jsonArrayContains(json: Column, needle: String, numericNeedle: Boolean): Column =
    GraftBridge.column(JsonArrayContains(GraftBridge.expression(json), needle, numericNeedle))

  /** Column API: scalar array of extracted paths (use `.getItem(i)`). */
  def jsonPaths(json: Column, paths: Seq[String]): Column =
    GraftBridge.column(JsonPathsExtract(GraftBridge.expression(json), paths))

  /** Column API: generator producing one column per path (alias with `.as(names)`). */
  def jsonPathsTuple(json: Column, paths: Seq[String]): Column =
    GraftBridge.column(JsonPathsGenerate(GraftBridge.expression(json), paths))

  /**
   * Column API: typed top-level scan — `(v0,t0,…,vN-1,tN-1[,undeclared])`
   * per row (alias with `.as(names)`).
   */
  def jsonTopFields(json: Column, names: Seq[String],
                    collectUndeclared: Boolean = false): Column =
    GraftBridge.column(
      JsonTopFieldsGenerate(GraftBridge.expression(json), names, collectUndeclared))
}
