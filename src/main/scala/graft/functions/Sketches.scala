package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable sketch aggregators (north-star extension; no reference
  * counterpart) — the `Aggregator[IN, BUF, OUT]` tier of Spark's custom-
  * function ladder (SURVEY.md §7): typed state, map-side partials, and
  * executor-side merges, for aggregates no built-in expression covers.
  *
  * [[MisraGries]] is the classic deterministic heavy-hitter sketch: a
  * bounded map of at most `capacity` counters summarizing an unbounded
  * value stream in one pass. Guarantee (also after arbitrary merges):
  * every value occurring more than n/(capacity+1) times IS present in the
  * sketch, and each reported count undercounts the true frequency by at
  * most n/(capacity+1). Use it where [[graft.operators.TopN.heavyHitters]]
  * would first build the full (group, value) count table but the value
  * cardinality is too large even for that — the sketch holds O(capacity)
  * state per group regardless of cardinality.
  */
object Sketches {

  /** Misra-Gries bounded-counter sketch over string values. The buffer is
    * an immutable Map encoded with Spark's PRODUCT ExpressionEncoder (a
    * catalyst MapType — no Kryo anywhere, so shuffle/spill serialization
    * of partial sketches is the compact columnar form). Between rows the
    * buffer lives as a plain object inside the typed-imperative aggregate;
    * immutable-map updates are O(1) amortized structural sharing. Output
    * keeps the surviving counters — decrement-phase undercounts included,
    * as the algorithm defines. */
  class MisraGries(capacity: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(capacity >= 1, "capacity must be >= 1")

    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], v: String): Map[String, Long] =
      if (v == null) b else addCount(b, v, 1L)

    def merge(
        a: Map[String, Long],
        b: Map[String, Long]
    ): Map[String, Long] =
      b.foldLeft(a) { case (acc, (v, c)) => addCount(acc, v, c) }

    def finish(b: Map[String, Long]): Map[String, Long] = b

    private def addCount(
        b: Map[String, Long],
        v: String,
        c: Long
    ): Map[String, Long] = {
      val updated = b.updated(v, b.getOrElse(v, 0L) + c)
      // over capacity: subtract the (capacity+1)-th largest count from
      // everything and drop non-positive counters — the batched form of
      // MG's decrement-all step, correct for weighted inserts and merges
      if (updated.size > capacity) {
        val cut = updated.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
        updated.collect { case (k, n) if n - cut > 0 => k -> (n - cut) }
      } else updated
    }

    def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Column form: `mgTopK(col, capacity)` aggregates to a map of surviving
    * (value -> approximate count) counters. */
  def mgSketch(column: Column, capacity: Int): Column =
    udaf(new MisraGries(capacity), Encoders.STRING).apply(column)
}
