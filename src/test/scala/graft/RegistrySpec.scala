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

  test("committed bench artifact's key set is a subset of the live registry") {
    // The committed bench_out.json may legitimately TRAIL the registry
    // mid-round (new queries land before the next full bench run — the
    // tool's full-run exact check catches that at verify time), but it must
    // never name a query the registry no longer has: that means a rename or
    // deletion shipped without re-running the bench, and the two binding
    // artifacts would disagree on identity, not just count.
    val f = new java.io.File("bench_out.json")
    if (f.exists()) {
      val txt = scala.io.Source.fromFile(f).mkString
      // minimal parse: keys of the top-level "queries" object
      val m = """"queries":\{(.*?)\}""".r.findFirstMatchIn(txt)
      assert(m.isDefined, "bench_out.json has no queries object")
      val benchKeys = """"([a-z0-9_]+)":""".r.findAllMatchIn(m.get.group(1))
        .map(_.group(1)).toSet
      val gone = benchKeys -- SparkEntry.queries.keySet
      assert(gone.isEmpty,
        s"bench_out.json names queries the registry lost (rename/delete without re-bench): ${gone.toSeq.sorted.mkString(", ")}")
      assert(benchKeys.nonEmpty)
    }
  }
}
