package graft.operators

import graft.SparkSpec
import graft.core.ChangeEvent
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Predicate semantics pinned to the reference's filter tests
 * (crates/processors/tests/filter_processor_tests.rs, semantics
 * filter.rs:132-210, FIXTURES.md §C1).
 */
class FilterProcessorSpec extends SparkSpec {
  import FilterProcessor._

  private val payload =
    """{"id": 42, "status": "active", "amount": 99.5, "tier": "gold",
      | "email": "a@example.com",
      | "address": {"country": "DE", "city": "Berlin"}, "deleted_at": null}""".stripMargin

  private def ev(op: String = "c", after: String = payload, before: String = null,
                 db: String = "inventory", table: String = "customers"): DataFrame = {
    import spark.implicits._
    ChangeEvent.conform(
      Seq((op, after, before, db, table)).toDF("op", "after", "before", "_db", "_tbl")
        .withColumn("source", struct(lit(db).as("db"), lit(table).as("table")))
        .drop("_db", "_tbl"))
  }

  private def passes(cfg: Config, df: DataFrame): Boolean =
    FilterProcessor(cfg)(df).count() == 1

  test("eq numeric across int/float (json_eq, filter.rs:292-300)") {
    assert(passes(Config(predicates = Seq(Eq("id", 42))), ev()))
    assert(passes(Config(predicates = Seq(Eq("id", 42.0))), ev()))
    assert(passes(Config(predicates = Seq(Eq("amount", 99.5))), ev()))
    assert(!passes(Config(predicates = Seq(Eq("id", 43))), ev()))
  }

  test("eq string + dotted path resolution") {
    assert(passes(Config(predicates = Seq(Eq("status", "active"))), ev()))
    assert(passes(Config(predicates = Seq(Eq("address.country", "DE"))), ev()))
    assert(!passes(Config(predicates = Seq(Eq("address.country", "FR"))), ev()))
  }

  test("ordering gt/gte/lt/lte numeric and string") {
    assert(passes(Config(predicates = Seq(Gt("amount", 99))), ev()))
    assert(passes(Config(predicates = Seq(Gte("amount", 99.5))), ev()))
    assert(passes(Config(predicates = Seq(Lt("amount", 100))), ev()))
    assert(!passes(Config(predicates = Seq(Lt("amount", 99.5))), ev()))
    assert(passes(Config(predicates = Seq(Gt("tier", "alpha"))), ev())) // lexicographic
  }

  test("in / not_in; not_in passes on missing field (filter.rs:177-184)") {
    assert(passes(Config(predicates = Seq(In("tier", Seq("gold", "silver")))), ev()))
    assert(!passes(Config(predicates = Seq(In("tier", Seq("bronze")))), ev()))
    assert(!passes(Config(predicates = Seq(NotIn("tier", Seq("gold")))), ev()))
    assert(passes(Config(predicates = Seq(NotIn("nonexistent", Seq("x")))), ev()))
    assert(!passes(Config(predicates = Seq(In("nonexistent", Seq("x")))), ev()))
  }

  test("contains + regex") {
    assert(passes(Config(predicates = Seq(Contains("email", "@example"))), ev()))
    assert(passes(Config(predicates = Seq(Regex("email", "^[a-z]+@[a-z.]+$"))), ev()))
    assert(!passes(Config(predicates = Seq(Regex("email", "^x"))), ev()))
  }

  test("contains on ARRAY fields is membership with json_eq, not substring (filter.rs:185-198)") {
    val arr = """{"tags": ["gold", "eu-west", 42], "name": "xabx"}"""
    // string element: exact membership — substring of an element must NOT match
    assert(passes(Config(predicates = Seq(Contains("tags", "gold"))), ev(after = arr)))
    assert(!passes(Config(predicates = Seq(Contains("tags", "gol"))), ev(after = arr)))
    // numeric NEEDLE matches numeric elements via f64 (json_eq 42 == 42.0)…
    assert(passes(Config(predicates = Seq(Contains("tags", 42))), ev(after = arr)))
    assert(passes(Config(predicates = Seq(Contains("tags", 42.0))), ev(after = arr)))
    assert(!passes(Config(predicates = Seq(Contains("tags", 43))), ev(after = arr)))
    // …but the needle's TYPE matters: "42" (string) never matches Number(42)
    assert(!passes(Config(predicates = Seq(Contains("tags", "42"))), ev(after = arr)))
    // plain STRING fields keep substring semantics; numeric needle there = false
    assert(passes(Config(predicates = Seq(Contains("name", "ab"))), ev(after = arr)))
    assert(!passes(Config(predicates = Seq(Contains("name", 42))), ev(after = arr)))
    // missing field → false
    assert(!passes(Config(predicates = Seq(Contains("nope", "x"))), ev(after = arr)))
  }

  test("exists / not_exists; JSON null means not-exists (filter.rs:265-271)") {
    assert(passes(Config(predicates = Seq(Exists("id"))), ev()))
    assert(passes(Config(predicates = Seq(NotExists("missing"))), ev()))
    assert(passes(Config(predicates = Seq(NotExists("deleted_at"))), ev())) // null => not exists
    assert(!passes(Config(predicates = Seq(Exists("deleted_at"))), ev()))
  }

  test("changed: before≠after, with create/delete unconditional pass (filter.rs:275-289)") {
    val changed = Config(predicates = Seq(Changed("status")))
    val before = """{"id": 42, "status": "inactive"}"""
    assert(passes(changed, ev(op = "u", before = before))) // status changed
    assert(!passes(changed, ev(op = "u", before = payload))) // unchanged
    assert(passes(changed, ev(op = "c", before = null))) // create passes
    assert(passes(changed, ev(op = "d", before = payload))) // delete passes
  }

  test("op gate and match_mode any/all") {
    assert(passes(Config(ops = Seq("c", "u")), ev(op = "c")))
    assert(!passes(Config(ops = Seq("u", "d")), ev(op = "c")))
    val preds = Seq(Eq("status", "active"), Eq("tier", "bronze"))
    assert(!passes(Config(predicates = preds, matchMode = MatchAll), ev()))
    assert(passes(Config(predicates = preds, matchMode = MatchAny), ev()))
  }

  test("table globs: exact, bare, db.*, prefix%, *.name (patterns.rs:47-198)") {
    assert(passes(Config(tables = Seq("inventory.customers")), ev()))
    assert(passes(Config(tables = Seq("customers")), ev()))
    assert(passes(Config(tables = Seq("inventory.*")), ev()))
    assert(passes(Config(tables = Seq("cust%")), ev()))
    assert(passes(Config(tables = Seq("*.customers")), ev()))
    assert(!passes(Config(tables = Seq("other.*")), ev()))
    assert(!passes(Config(tables = Seq("orders")), ev()))
  }
}
