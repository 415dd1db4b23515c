package graft.functions

import graft.SparkSpec
import graft.core.ChangeEvent
import graft.operators.FilterProcessor
import org.apache.spark.sql.functions._

/**
 * Fused multi-path JSON extraction: get_json_object equivalence + the
 * parse-once plan shape (one Generate feeding the payload-predicate filter).
 */
class JsonPathOpsSpec extends SparkSpec {

  private val doc =
    """{"a": 1, "b": "x\ny", "c": 1.50, "d": true, "e": null,
      | "nest": {"k": "v", "deep": {"z": 42}},
      | "arr": [1, 2, {"q": 3}],
      | "obj": {"num": 99.99, "s": "t"}}""".stripMargin

  test("scan: scalars keep exact literals, strings unescape, null/missing are null") {
    val out = JsonPathOps.scan(doc, JsonPathOps.splitPaths(Seq(
      "a", "b", "c", "d", "e", "missing", "nest.k", "nest.deep.z", "b.sub")))
    assert(out(0) == "1")
    assert(out(1) == "x\ny") // unescaped, like get_json_object
    assert(out(2) == "1.50") // exact source literal for scalar numbers
    assert(out(3) == "true")
    assert(out(4) == null) // JSON null
    assert(out(5) == null) // missing
    assert(out(6) == "v")
    assert(out(7) == "42")
    assert(out(8) == null) // traversal into a scalar
  }

  test("scan: objects/arrays re-serialize compact, get_json_object-compatible") {
    val out = JsonPathOps.scan(doc, JsonPathOps.splitPaths(Seq("obj", "arr", "nest.deep")))
    assert(out(0) == """{"num":99.99,"s":"t"}""")
    assert(out(1) == """[1,2,{"q":3}]""")
    assert(out(2) == """{"z":42}""")
  }

  test("scan: overlap — a prefix and its descendant both requested") {
    val out = JsonPathOps.scan(doc, JsonPathOps.splitPaths(Seq("nest", "nest.deep.z", "nest.k")))
    assert(out(0) == """{"k":"v","deep":{"z":42}}""")
    assert(out(1) == "42")
    assert(out(2) == "v")
  }

  test("scan: malformed / null / non-object JSON gives all nulls") {
    assert(JsonPathOps.scan("{bad", JsonPathOps.splitPaths(Seq("a"))).forall(_ == null))
    assert(JsonPathOps.scan(null, JsonPathOps.splitPaths(Seq("a"))).forall(_ == null))
    assert(JsonPathOps.scan("[1,2]", JsonPathOps.splitPaths(Seq("a"))).forall(_ == null))
  }

  test("column forms agree with get_json_object across a corpus") {
    import spark.implicits._
    val docs = Seq(
      doc,
      """{"x": {"y": "z"}}""",
      """{"a": "only-a"}""",
      "null",
      """{"dup": 1, "dup": 2}""").toDF("j")
    val paths = Seq("a", "nest.k", "obj", "x.y", "dup")
    val viaGjo = docs.select(paths.map(p => get_json_object(col("j"), "$." + p)).toIndexedSeq: _*)
    val viaFused = docs.select(col("*"),
        JsonPathOps.jsonPathsTuple(col("j"), paths).as(paths.indices.map(i => s"c$i")))
      .select(paths.indices.map(i => col(s"c$i")).toIndexedSeq: _*)
    val viaScalar = {
      val arr = JsonPathOps.jsonPaths(col("j"), paths)
      docs.select(paths.indices.map(i => arr.getItem(i)).toIndexedSeq: _*)
    }
    val a = viaGjo.collect().map(_.toSeq)
    assert(viaFused.collect().map(_.toSeq).toSeq == a.toSeq)
    assert(viaScalar.collect().map(_.toSeq).toSeq == a.toSeq)
  }

  test("typed top-field scan: tags preserve quoting and null-vs-missing") {
    import spark.implicits._
    val docs = Seq(
      """{"i": 7, "f": 1.5, "s": "123", "b": true, "n": null,
        | "o": {"k": 1}, "a": [1,2], "undeclared1": 1, "undeclared2": {"x": 2}}""".stripMargin,
      "{bad json",
      """{"i": "oops", "i": 2}""").toDF("j")
    val names = Seq("i", "f", "s", "b", "n", "o", "a", "gone")
    val cols = names.indices.flatMap(i => Seq(s"v$i", s"t$i")) :+ "und"
    val rows = docs.select(
        JsonPathOps.jsonTopFields(col("j"), names, collectUndeclared = true).as(cols))
      .collect()
    val r0 = rows(0)
    def vt(r: org.apache.spark.sql.Row, i: Int) = (r.getString(2 * i), r.getString(2 * i + 1))
    assert(vt(r0, 0) == ("7", "int"))
    assert(vt(r0, 1) == ("1.5", "float"))
    assert(vt(r0, 2) == ("123", "string")) // quoted "123" is a STRING, not int
    assert(vt(r0, 3) == ("true", "bool"))
    assert(vt(r0, 4) == (null, "null")) // explicit null ≠ missing
    assert(vt(r0, 5) == ("""{"k":1}""", "object"))
    assert(vt(r0, 6) == ("[1,2]", "array"))
    assert(vt(r0, 7) == (null, "missing"))
    assert(r0.getSeq[String](names.length * 2) == Seq("undeclared1", "undeclared2"))
    // malformed: everything missing, nothing undeclared
    assert(names.indices.forall(i => vt(rows(1), i) == (null, "missing")))
    assert(rows(1).getSeq[String](names.length * 2).isEmpty)
    // duplicate key: first occurrence wins (like scan/get_json_object)
    assert(vt(rows(2), 0) == ("oops", "string"))
  }

  test("filter plan: payload predicates do one fused parse (single Generate)") {
    import spark.implicits._
    import FilterProcessor._
    val ev = ChangeEvent.conform(
      (1 to 100).map(i => ("c", s"""{"p": $i, "q": "v$i", "r": {"s": $i}}"""))
        .toDF("op", "after"))
    val cfg = Config(predicates = Seq(
      Gt("p", 10), Eq("q", "v42"), Lte("r.s", 80), Exists("p")))
    val out = FilterProcessor(cfg)(ev)
    val plan = out.queryExecution.optimizedPlan.toString
    // exactly one generator parse of `after`; no per-predicate re-parses
    assert(plan.split("json_paths_tuple").length - 1 == 1, plan)
    assert(!plan.contains("get_json_object"), plan)
    assert(out.count() == 1) // p=42: >10, q==v42, r.s<=80
  }

  test("filter parse-once matches legacy gate semantics") {
    import spark.implicits._
    import FilterProcessor._
    val ev = ChangeEvent.conform(
      (1 to 200).map { i =>
        val op = if (i % 3 == 0) "u" else "c"
        val before = if (op == "u") s"""{"p": ${i - 1}, "q": "a"}""" else null
        (op, before, s"""{"p": $i, "q": "${if (i % 2 == 0) "a" else "b"}"}""")
      }.toDF("op", "before", "after"))
    for (mode <- Seq(MatchAll, MatchAny)) {
      val cfg = Config(
        predicates = Seq(Gt("p", 50), Eq("q", "a"), Changed("p")),
        matchMode = mode)
      val fused = FilterProcessor(cfg)(ev).select("after").collect().map(_.getString(0)).sorted
      val legacy = ev.filter(gate(cfg)).select("after").collect().map(_.getString(0)).sorted
      assert(fused.toSeq == legacy.toSeq, s"mode=$mode")
    }
  }
}
