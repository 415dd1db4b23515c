package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/**
 * SpaceSaving heavy-hitters sketch as a typed Spark Aggregator.
 *
 * Reference: the high-cardinality field classifier's heavy-hitter tracking
 * (crates/schema-sensing/src/high_cardinality.rs:8-70) — the reference's only
 * bespoke sketch; HLL maps to `approx_count_distinct`, this maps to
 * SpaceSaving (Metwally et al.): k counters, admit new items by evicting the
 * minimum and inheriting its count as the error bound. Guarantees: any item
 * with true frequency > n/k is present; reported count overestimates by at
 * most `err`.
 *
 * Merge is the standard counter-wise union + re-truncation to k, so the
 * aggregator is shuffle-safe (partial aggregation on executors, one merged
 * sketch per group).
 */
object SpaceSaving {

  case class Counter(item: String, count: Long, err: Long)
  case class Sketch(k: Int, counters: Map[String, (Long, Long)]) { // item -> (count, err)
    def top(n: Int): Seq[Counter] =
      counters.toSeq.map { case (i, (c, e)) => Counter(i, c, e) }
        .sortBy(c => (-c.count, c.item)).take(n)
  }

  class SpaceSavingAgg(k: Int) extends Aggregator[String, Sketch, Seq[Counter]] {
    def zero: Sketch = Sketch(k, Map.empty)

    def reduce(b: Sketch, item: String): Sketch = {
      val m = b.counters
      m.get(item) match {
        case Some((c, e)) => b.copy(counters = m.updated(item, (c + 1, e)))
        case None if m.size < k => b.copy(counters = m.updated(item, (1L, 0L)))
        case None =>
          // evict the min counter; new item inherits its count as error bound
          val (minItem, (minC, _)) = m.minBy { case (i, (c, _)) => (c, i) }
          b.copy(counters = (m - minItem).updated(item, (minC + 1, minC)))
      }
    }

    def merge(x: Sketch, y: Sketch): Sketch = {
      val merged = mutable.Map.empty[String, (Long, Long)]
      (x.counters.keySet ++ y.counters.keySet).foreach { i =>
        val (c1, e1) = x.counters.getOrElse(i, (0L, 0L))
        val (c2, e2) = y.counters.getOrElse(i, (0L, 0L))
        merged(i) = (c1 + c2, e1 + e2)
      }
      val kept = merged.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(k)
      Sketch(k, kept.toMap)
    }

    def finish(b: Sketch): Seq[Counter] = b.top(k)
    def bufferEncoder: Encoder[Sketch] = Encoders.product[Sketch]
    def outputEncoder: Encoder[Seq[Counter]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Counter]]()
  }

  /** Column form: `spaceSaving(16)(col)` usable in `agg(...)`. */
  def apply(k: Int): Column => Column = {
    val agg = new SpaceSavingAgg(k)
    import org.apache.spark.sql.functions.udaf
    val fn = udaf(agg, Encoders.STRING)
    (c: Column) => fn(c)
  }
}
