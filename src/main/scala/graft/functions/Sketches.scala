package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoder, AgnosticEncoders, ExpressionEncoder}
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

    def bufferEncoder: Encoder[Map[String, Long]] = Sketches.mapStringLongEncoder
    def outputEncoder: Encoder[Map[String, Long]] = Sketches.mapStringLongEncoder
  }

  /** Catalyst MapType encoder built from explicit AgnosticEncoders — NO
    * scala-reflect TypeTags (the reflective `ExpressionEncoder[T]()` path
    * resolves types through the context classloader at query-analysis time
    * and breaks under REPL/embedded classloaders), and no Kryo: buffers
    * shuffle/spill in the compact columnar form. */
  private[graft] def mapStringLongEncoder: ExpressionEncoder[Map[String, Long]] =
    ExpressionEncoder(
      AgnosticEncoders.MapEncoder(
        scala.reflect.classTag[Map[String, Long]],
        AgnosticEncoders.StringEncoder,
        AgnosticEncoders.BoxedLongEncoder,
        valueContainsNull = false
      )
    )

  /** Primitive-array encoder for Count-Min buffers; same no-reflection,
    * no-Kryo contract as [[mapStringLongEncoder]]. */
  private[graft] def longArrayEncoder: ExpressionEncoder[Array[Long]] =
    ExpressionEncoder(
      AgnosticEncoders
        .ArrayEncoder(AgnosticEncoders.PrimitiveLongEncoder, containsNull = false)
        .asInstanceOf[AgnosticEncoder[Array[Long]]]
    )

  /** Column form: `mgTopK(col, capacity)` aggregates to a map of surviving
    * (value -> approximate count) counters. */
  def mgSketch(column: Column, capacity: Int): Column =
    udaf(new MisraGries(capacity), Encoders.STRING).apply(column)

  /** Count-Min sketch over string values: a depth x width counter matrix
    * (flattened row-major into one Array[Long] — primitive-array product
    * encoder, no Kryo). Each value increments one cell per row, chosen by
    * that row's hash; `estimate = min over rows of the value's cell`.
    * Guarantees (hold after arbitrary merges — the buffer merge is
    * cell-wise addition, so partial sketches combine map-side):
    * NEVER underestimates, and with probability >= 1 - 2^-depth
    * overestimates by at most 2n/width. The point-frequency complement of
    * [[MisraGries]] (which keeps only the survivors): use Count-Min when
    * arbitrary values must be queryable after one pass. */
  class CountMin(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(depth >= 1 && depth <= 16, "depth must be in [1, 16]")
    require(width >= 8, "width must be >= 8")

    def zero: Array[Long] = new Array[Long](depth * width)

    def reduce(b: Array[Long], v: String): Array[Long] = {
      if (v != null) {
        var r = 0
        while (r < depth) {
          b(r * width + CountMin.cell(v, r, width)) += 1L
          r += 1
        }
      }
      b
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    def finish(b: Array[Long]): Array[Long] = b

    def bufferEncoder: Encoder[Array[Long]] = Sketches.longArrayEncoder
    def outputEncoder: Encoder[Array[Long]] = Sketches.longArrayEncoder
  }

  object CountMin {
    /** Row r's cell index for value v — deterministic across JVMs
      * (MurmurHash3 of the string with the row as seed). */
    def cell(v: String, row: Int, width: Int): Int = {
      val h = scala.util.hashing.MurmurHash3.stringHash(v, row)
      ((h % width) + width) % width
    }

    /** Point-frequency estimate from a finished sketch. */
    def estimate(sketch: Array[Long], depth: Int, width: Int, v: String): Long = {
      require(sketch.length == depth * width, "sketch shape mismatch")
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = sketch(r * width + cell(v, r, width))
        if (c < best) best = c
        r += 1
      }
      best
    }
  }

  /** Column form: aggregates to the flattened depth x width counter
    * array; query with [[CountMin.estimate]]. */
  def cmSketch(column: Column, depth: Int, width: Int): Column =
    udaf(new CountMin(depth, width), Encoders.STRING).apply(column)
}
