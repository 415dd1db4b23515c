package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the Bench↔Verify contract at the registry level: both artifacts
 * enumerate `SparkEntry.queries`, and every query carries a DuckDB oracle
 * twin, so BENCH_r{N} and CORRECTNESS_r{N} can never silently diverge on
 * key set (r9: the committed bench timed 73 of 74 queries because
 * `dedup_survivors` landed one commit after the final bench run — this
 * spec plus Bench's `query_count_registry`/`query_count_timed` fields make
 * that class of drift loud).
 */
class RegistrySpec extends AnyFunSuite {
  test("queries and oracleSql cover the same key set") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracleSql keys without a query: ${(o -- q).toSeq.sorted.mkString(", ")}")
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted.mkString(", ")}")
  }

  test("query names are stable identifiers (lower_snake, nonempty)") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-snake-case query names: ${bad.toSeq.sorted.mkString(", ")}")
  }
}
