package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.catalyst.expressions.{GetJsonObject, Literal}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/**
 * Property tests pinning the correctness-critical parse-once scanner to
 * Spark's own `get_json_object` over generated nested documents — every
 * extracted path must agree byte-for-byte (the fused extractor replaced
 * get_json_object on the processor hot path, so divergence is a
 * correctness bug, not a style issue). Plus MiniJs JSON round-trip
 * equivalence against Jackson.
 */
object JsonPathProps extends Properties("graft.jsonpath") {

  private val mapper = new ObjectMapper()
  private val keys = Seq("a", "b", "cc", "d1", "x_y", "k")

  private val scalarGen: Gen[Any] = Gen.oneOf(
    Gen.choose(-9007199254740991L, 9007199254740991L).map(l => l: Any),
    Gen.asciiPrintableStr.map(_.take(12): Any),
    Gen.oneOf("héllo", "a\"b", "x\\y", "t\tt", "π∂", "").map(s => s: Any),
    Gen.oneOf(true, false).map(b => b: Any),
    Gen.const(null: Any))

  /** Random nested JsonNode up to `depth` levels of objects/arrays. */
  private def nodeGen(depth: Int): Gen[Any] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      4 -> scalarGen,
      3 -> Gen.listOfN(3, Gen.zip(Gen.oneOf(keys), nodeGen(depth - 1))).map(_.toMap: Any),
      1 -> Gen.listOfN(2, nodeGen(depth - 1)).map(_.toVector: Any))

  private def toNode(v: Any): com.fasterxml.jackson.databind.JsonNode = v match {
    case null => mapper.nullNode()
    case l: Long => mapper.getNodeFactory.numberNode(l)
    case s: String => mapper.getNodeFactory.textNode(s)
    case b: Boolean => mapper.getNodeFactory.booleanNode(b)
    case m: Map[_, _] =>
      val o: ObjectNode = mapper.createObjectNode()
      m.foreach { case (k, x) => o.set[com.fasterxml.jackson.databind.JsonNode](k.toString, toNode(x)) }
      o
    case xs: Vector[_] =>
      val a: ArrayNode = mapper.createArrayNode()
      xs.foreach(x => a.add(toNode(x)))
      a
  }

  private val docGen: Gen[String] =
    Gen.listOfN(4, Gen.zip(Gen.oneOf(keys), nodeGen(3)))
      .map(kvs => mapper.writeValueAsString(toNode(kvs.toMap)))

  private val pathGen: Gen[String] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, Gen.oneOf(keys)).map(_.mkString(".")))

  private def viaSpark(json: String, path: String): String = {
    val r = GetJsonObject(
      Literal(UTF8String.fromString(json), StringType),
      Literal(UTF8String.fromString("$." + path), StringType)).eval(null)
    if (r == null) null else r.toString
  }

  property("fused scan == get_json_object on every generated doc × path") =
    Prop.forAll(docGen, Gen.listOfN(5, pathGen)) { (json, paths) =>
      val got = JsonPathOps.scan(json, JsonPathOps.splitPaths(paths))
      paths.indices.forall { i =>
        val want = viaSpark(json, paths(i))
        val ok = got(i) == want
        if (!ok) println(s"MISMATCH json=$json path=${paths(i)} got=${got(i)} want=$want")
        ok
      }
    }

  property("fused scan: one pass over N paths == N independent scans") =
    Prop.forAll(docGen, Gen.listOfN(6, pathGen)) { (json, paths) =>
      val fused = JsonPathOps.scan(json, JsonPathOps.splitPaths(paths))
      paths.indices.forall { i =>
        fused(i) == JsonPathOps.scan(json, JsonPathOps.splitPaths(Seq(paths(i))))(0)
      }
    }

  import graft.operators.MiniJs

  property("MiniJs JSON.parse ∘ stringify is semantically Jackson-equal") =
    Prop.forAll(docGen) { json =>
      val out = MiniJs.stringify(MiniJs.parseJson(json))
      mapper.readTree(out) == mapper.readTree(json)
    }

  property("MiniJs evaluates JSON round-trips inside scripts too") =
    Prop.forAll(docGen) { json =>
      val e = new MiniJs.Engine()
      e.eval("function main(s) { return JSON.stringify(JSON.parse(s)); }")
      val out = MiniJs.toStr(e.call("main", Seq(MiniJs.VStr(json))))
      mapper.readTree(out) == mapper.readTree(json)
    }
}
