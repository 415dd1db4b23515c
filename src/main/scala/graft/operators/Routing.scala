package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * `${dotted.path}` routing templates for topics / keys / subjects / URLs.
 *
 * Reference: crates/common/src/routing.rs:94-236 (parse-once compile, static
 * fast path, ≤3 path segments, strict vs lenient resolution) and resolution
 * order crates/deltaforge-core/src/routing.rs:17-65 (per-event `routing.topic`
 * override → sink template → static default; empty string = no override).
 *
 * Compiled once at plan-build time into a `concat` of literals and column
 * refs — Catalyst constant-folds all-literal templates (the reference's
 * "static fast path" is free here).
 */
object Routing {

  /** Parsed template segment. */
  private sealed trait Seg
  private case class Lit(s: String) extends Seg
  private case class Ref(path: String) extends Seg

  /** Parse a template; fails fast on unclosed `${`, empty `${}`, >3 segments. */
  private def parse(template: String): Seq[Seg] = {
    val out = Seq.newBuilder[Seg]
    var i = 0
    while (i < template.length) {
      val start = template.indexOf("${", i)
      if (start < 0) { out += Lit(template.substring(i)); i = template.length }
      else {
        if (start > i) out += Lit(template.substring(i, start))
        val end = template.indexOf('}', start + 2)
        if (end < 0) throw new IllegalArgumentException(s"unclosed $${ in template: $template")
        val path = template.substring(start + 2, end).trim
        if (path.isEmpty) throw new IllegalArgumentException(s"empty $${} in template: $template")
        if (path.count(_ == '.') > 2) throw new IllegalArgumentException(
          s"template path '$path' exceeds 3 segments (reference routing.rs:119)")
        out += Ref(path)
        i = end + 1
      }
    }
    out.result()
  }

  /**
   * Resolve a dotted path against the event envelope: envelope struct fields
   * (`source.table`, `tenant_id`, …) resolve as columns; `before.*`/`after.*`
   * resolve into the JSON payload with `get_json_object`.
   */
  def resolvePath(path: String): Column = path.split('.') match {
    case Array(p0, rest @ _*) if p0 == "before" || p0 == "after" =>
      get_json_object(col(p0), "$." + rest.mkString("."))
    case _ => col(path)
  }

  /**
   * Compile a template to a Column. `strict = true` yields NULL when any
   * segment is missing (caller routes to DLQ); lenient substitutes "".
   *
   * Parse-once: when a template references ≥2 paths into the same JSON
   * payload (`before.*`/`after.*`), they are fused into a single
   * [[graft.functions.JsonPathOps.JsonPathsExtract]] — one parse per row per
   * payload instead of one per segment (whole-stage codegen CSE evaluates the
   * shared array once; the reference compiles templates parse-once too,
   * common/src/routing.rs:94-236).
   */
  def template(tpl: String, strict: Boolean = false): Column = {
    val segs = parse(tpl)
    val payloadRefs = segs.collect {
      case Ref(p) if p.startsWith("before.") || p.startsWith("after.") => p
    }.distinct
    val fused: Map[String, Column] = payloadRefs
      .groupBy(_.takeWhile(_ != '.'))
      .filter(_._2.size >= 2)
      .flatMap { case (root, refs) =>
        val arr = graft.functions.JsonPathOps.jsonPaths(
          col(root), refs.map(_.drop(root.length + 1)))
        refs.zipWithIndex.map { case (r, i) => r -> arr.getItem(i) }
      }
    def resolve(p: String): Column = fused.getOrElse(p, resolvePath(p))
    val cols = segs.map {
      case Lit(s) => lit(s)
      case Ref(p) => if (strict) resolve(p) else coalesce(resolve(p), lit(""))
    }
    if (cols.isEmpty) lit("") else concat(cols: _*)
  }

  /**
   * Full topic resolution order (reference deltaforge-core/src/routing.rs:17-65):
   * event override (empty string = no override) → sink template → static default.
   */
  def resolveTopic(sinkTemplate: Option[String], staticTopic: String): Column = {
    val overrideTopic = when(length(col("routing.topic")) > 0, col("routing.topic"))
    val tplCol = sinkTemplate.map(t => template(t)).getOrElse(lit(null))
    coalesce(overrideTopic, tplCol, lit(staticTopic))
  }

  /** Key resolution: event routing.key override → template → null (sink PK fallback). */
  def resolveKey(sinkTemplate: Option[String]): Column = {
    val overrideKey = when(length(col("routing.key")) > 0, col("routing.key"))
    val tplCol = sinkTemplate.map(t => template(t)).getOrElse(lit(null))
    coalesce(overrideKey, tplCol)
  }
}
