package graft.functions

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Dynamic-JSON flatten: flattens a schemaless JSON object string to a flat
 * one-level JSON object with `parent__child` keys — the reference's flatten
 * processor operates on dynamic payloads exactly like this
 * (crates/processors/src/flatten.rs:29-203), whereas
 * [[graft.operators.FlattenProcessor]] is the schema-driven (typed, fully
 * codegen'd) variant used when a ledger schema exists.
 *
 * Policies mirror flatten_cfg.rs:6-100: `maxDepth` (deeper values kept as
 * opaque JSON leaves), lists `preserve` (raw array leaf) vs `index`
 * (`name__0…`), empty object/list policy `preserve | drop | null`.
 * Number fidelity: Jackson is configured with BigDecimal floats so payload
 * decimals never round-trip through binary doubles (SURVEY §7.4 risk 4).
 */
object JsonFlatten {

  sealed trait EmptyPolicy
  case object EmptyPreserve extends EmptyPolicy
  case object EmptyDrop extends EmptyPolicy
  case object EmptyNull extends EmptyPolicy

  case class FlattenJsonStr(
      child: Expression,
      separator: String = "__",
      maxDepth: Int = Int.MaxValue,
      indexLists: Boolean = false,
      emptyPolicy: EmptyPolicy = EmptyPreserve) extends UnaryExpression with CodegenFallback {

    override def nullIntolerant: Boolean = true
    override def dataType: DataType = StringType
    override def prettyName: String = "flatten_json"

    @transient private lazy val mapper: ObjectMapper = {
      val m = new ObjectMapper()
      m.configure(DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS, true)
      m
    }

    override protected def nullSafeEval(input: Any): Any = {
      val root = mapper.readTree(input.toString)
      if (!root.isObject) return UTF8String.fromString(root.toString)
      val out = JsonNodeFactory.instance.objectNode()

      def put(key: String, node: JsonNode): Unit = {
        val isEmptyContainer =
          (node.isObject && node.isEmpty) || (node.isArray && node.isEmpty)
        if (isEmptyContainer) emptyPolicy match {
          case EmptyPreserve => out.set[JsonNode](key, node); ()
          case EmptyDrop => ()
          case EmptyNull => out.putNull(key); ()
        } else { out.set[JsonNode](key, node); () }
      }

      def walk(node: JsonNode, prefix: String, depth: Int): Unit = {
        if (node.isObject && !node.isEmpty && depth < maxDepth) {
          node.properties().forEach { e =>
            val key = if (prefix.isEmpty) e.getKey else prefix + separator + e.getKey
            walk(e.getValue, key, depth + 1)
          }
        } else if (node.isArray && !node.isEmpty && indexLists && depth < maxDepth) {
          var i = 0
          while (i < node.size()) { walk(node.get(i), prefix + separator + i, depth + 1); i += 1 }
        } else put(prefix, node)
      }

      walk(root, "", 0)
      UTF8String.fromString(mapper.writeValueAsString(out))
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def flattenJson(json: Column, separator: String = "__", maxDepth: Int = Int.MaxValue,
                  indexLists: Boolean = false, emptyPolicy: EmptyPolicy = EmptyPreserve): Column =
    GraftBridge.column(FlattenJsonStr(GraftBridge.expression(json), separator, maxDepth,
      indexLists, emptyPolicy))
}
