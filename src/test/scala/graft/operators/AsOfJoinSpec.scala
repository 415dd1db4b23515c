package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Point-in-time join semantics + plan shape. */
class AsOfJoinSpec extends SparkSpec {

  test("asOf matches the greatest right ts <= left ts per key; nulls when none") {
    import spark.implicits._
    val facts = Seq( // (id, key, ts)
      (1L, "a", 100L), (2L, "a", 205L), (3L, "b", 50L), (4L, "b", 300L), (5L, "c", 10L)
    ).toDF("id", "k", "ts")
    val dims = Seq( // (key, ts, rate)
      ("a", 90L, 1.0), ("a", 200L, 2.0), ("a", 206L, 9.0), // 206 is AFTER fact 2
      ("b", 300L, 5.0) // equal ts — at-or-before includes it
    ).toDF("k", "vts", "rate")
    val got = AsOfJoin.asOf(facts, dims, "k", "ts", "vts")
      .select(col("id"), col("asof.rate"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(
      1L -> Some(1.0), // 90 <= 100, not 200
      2L -> Some(2.0), // 200 <= 205, not 206
      3L -> None,      // no dim at-or-before 50
      4L -> Some(5.0), // equal ts matches
      5L -> None))     // key with no dims at all
  }

  test("asOf equals a naive max-filter reference on random data") {
    import spark.implicits._
    def h(s: String): Long = math.abs(graft.functions.ReservoirSample.priority(s)) % 1000
    val facts = (1 to 300).map(i => (i.toLong, (h(s"fk$i") % 7).toString, h(s"ft$i")))
      .toDF("id", "k", "ts")
    val dimRows = (1 to 100).map(i => ((h(s"dk$i") % 7).toString, h(s"dt$i"), i.toDouble))
    val dims = dimRows.toDF("k", "vts", "rate")
    val got = AsOfJoin.asOf(facts, dims, "k", "ts", "vts")
      .select(col("id"), col("asof.vts"), col("asof.rate"))
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    val byKey = dimRows.groupBy(_._1)
    (1 to 300).foreach { i =>
      val (id, k, ts) = (i.toLong, (h(s"fk$i") % 7).toString, h(s"ft$i"))
      val candidates = byKey.getOrElse(k, Nil).filter(_._2 <= ts)
      val want =
        if (candidates.isEmpty) None
        // ties on vts: the window picks ONE deterministically; accept any
        // tied rate in the reference (documented ambiguity)
        else {
          val best = candidates.map(_._2).max
          Some(candidates.filter(_._2 == best).map(_._3).toSet)
        }
      (want, got(id)) match {
        case (None, g) => assert(g.isEmpty, s"fact $id: expected no match, got $g")
        case (Some(set), g) => assert(g.isDefined && set.contains(g.get.asInstanceOf[Double]),
          s"fact $id: got $g not in $set")
      }
    }
  }

  test("plan: one keyed exchange + window — no range-join explosion") {
    import spark.implicits._
    val facts = (1L to 100L).map(i => (i, i % 5, i * 10)).toDF("id", "k", "ts")
    val dims = (1L to 50L).map(i => (i % 5, i * 17, i.toDouble)).toDF("k", "vts", "rate")
    val plan = AsOfJoin.asOf(facts, dims, "k", "ts", "vts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not fall back to a range/cross join:\n$plan")
    assert(plan.contains("Window"), s"expected the running-window shape:\n$plan")
  }
}
