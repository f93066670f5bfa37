package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.mutable

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

  /** Misra-Gries bounded-counter sketch over string values. Buffer and
    * output are plain Maps (Kryo-free product encoders); output keeps the
    * surviving counters — decrement-phase undercounts included, as the
    * algorithm defines. */
  class MisraGries(capacity: Int)
      extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {
    require(capacity >= 1, "capacity must be >= 1")

    def zero: mutable.Map[String, Long] = mutable.Map.empty

    def reduce(b: mutable.Map[String, Long], v: String): mutable.Map[String, Long] =
      if (v == null) b else addCount(b, v, 1L)

    def merge(
        a: mutable.Map[String, Long],
        b: mutable.Map[String, Long]
    ): mutable.Map[String, Long] =
      b.foldLeft(a) { case (acc, (v, c)) => addCount(acc, v, c) }

    def finish(b: mutable.Map[String, Long]): Map[String, Long] = b.toMap

    private def addCount(
        b: mutable.Map[String, Long],
        v: String,
        c: Long
    ): mutable.Map[String, Long] = {
      b.updateWith(v) {
        case Some(n) => Some(n + c)
        case None    => Some(c)
      }
      // over capacity: subtract the (capacity+1)-th largest count from
      // everything and drop non-positive counters — the batched form of
      // MG's decrement-all step, correct for weighted inserts and merges
      if (b.size > capacity) {
        val cut = b.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
        val dead = b.collect { case (k, n) if n - cut <= 0 => k }.toSeq
        dead.foreach(b.remove)
        b.mapValuesInPlace((_, n) => n - cut)
      }
      b
    }

    def bufferEncoder: Encoder[mutable.Map[String, Long]] =
      implicitly[Encoder[mutable.Map[String, Long]]](
        Encoders.kryo[mutable.Map[String, Long]]
      )
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Column form: `mgTopK(col, capacity)` aggregates to a map of surviving
    * (value -> approximate count) counters. */
  def mgSketch(column: Column, capacity: Int): Column =
    udaf(new MisraGries(capacity), Encoders.STRING).apply(column)
}
