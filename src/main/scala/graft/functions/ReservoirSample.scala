package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Distributed value sampler as a typed Spark Aggregator — the third evidence
 * channel of the reference's high-cardinality field classifier
 * (crates/schema-sensing/src/high_cardinality.rs:8-70: HLL cardinality +
 * SpaceSaving heavy hitters + ReservoirSampler samples; sample use sites
 * `get_samples`/`get_dynamic_samples` :172-187).
 *
 * The reference's single-threaded reservoir uses RNG replacement. A faithful
 * RNG reservoir is NOT shuffle-safe on Spark: partial aggregates merge in
 * nondeterministic order, so task retries could observe different samples and
 * break exactly-once sinks downstream. Instead this is a *bottom-k sketch*
 * (Cohen & Kaplan, "Summarizing data using bottom-k sketches"): every
 * distinct value gets a fixed pseudo-random priority from a 64-bit hash and
 * the k smallest priorities win. Properties:
 *
 *  - uniform over DISTINCT values (the classifier wants field-name evidence,
 *    where distinct-uniform beats frequency-weighted: hot stable fields
 *    would otherwise crowd out the dynamic tail it is trying to catch);
 *  - fully mergeable (union + re-truncate) → partial aggregation on
 *    executors, one tiny sketch per group, shuffle-safe at 100 TB;
 *  - deterministic under retries, partitioning, and input order.
 */
object ReservoirSample {

  /** splitmix64 finalizer over FNV-1a — stable across JVMs, no RNG state. */
  def priority(item: String, seed: Long = 0x5EED5EED5EEDL): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < item.length) { h = (h ^ item.charAt(i)) * 0x100000001b3L; i += 1 }
    h += 0x9E3779B97F4A7C15L
    h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
    h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }

  /** item -> priority; keeps the k smallest priorities. */
  case class Sketch(k: Int, items: Map[String, Long]) {
    def sample: Seq[String] =
      items.toSeq.sortBy { case (i, p) => (p, i) }.map(_._1)
  }

  class ReservoirAgg(k: Int, seed: Long = 0x5EED5EED5EEDL)
      extends Aggregator[String, Sketch, Seq[String]] {
    def zero: Sketch = Sketch(k, Map.empty)

    private def truncate(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= k) m
      else m.toSeq.sortBy { case (i, p) => (p, i) }.take(k).toMap

    def reduce(b: Sketch, item: String): Sketch =
      if (item == null) b
      else if (b.items.contains(item)) b
      else b.copy(items = truncate(b.items.updated(item, priority(item, seed))))

    def merge(x: Sketch, y: Sketch): Sketch =
      Sketch(k, truncate(x.items ++ y.items))

    def finish(b: Sketch): Seq[String] = b.sample
    def bufferEncoder: Encoder[Sketch] = Encoders.product[Sketch]
    def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Column form: `reservoir(50)(col)` usable in `agg(...)`. */
  def apply(k: Int): Column => Column = {
    val agg = new ReservoirAgg(k)
    import org.apache.spark.sql.functions.udaf
    val fn = udaf(agg, Encoders.STRING)
    (c: Column) => fn(c)
  }
}
