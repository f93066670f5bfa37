package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Statistical disclosure control: round-to-multiple and low-count redaction.
  *
  * Capability parity with the reference's data-privacy surface
  * (reference: `src/hds_functions/data_privacy.py:15-136`).
  *
  * Both operators are per-row scalar expressions (no shuffle, fully inside
  * whole-stage codegen), so they compose freely after any aggregation at any
  * scale.
  */
object Privacy {

  /** Round each listed numeric column to the nearest `multiple`, HALF_UP, and
    * cast to long. E.g. 7 -> 5, 17 -> 15, 22 -> 20 at multiple=5.
    * Mirrors reference `data_privacy.py:64-67`: `cast(round(col/m)*m as long)`
    * — Spark's `round` is HALF_UP, matching the reference exactly.
    */
  def roundCountsToMultiple(
      df: DataFrame,
      columns: Seq[String],
      multiple: Int = 5
  ): DataFrame = {
    require(multiple > 0, "The 'multiple' argument must be a positive integer.")
    columns.foreach { c =>
      require(
        df.columns.contains(c),
        s"The column '$c' does not exist in the DataFrame."
      )
    }
    columns.foldLeft(df) { (d, c) =>
      d.withColumn(c, (round(col(c) / multiple) * multiple).cast(LongType))
    }
  }

  /** k-anonymity suppression over quasi-identifier columns: drop every row
    * whose quasi-identifier combination occurs fewer than `k` times — after
    * this, any attacker matching on the quasi identifiers finds at least
    * `k` candidate rows. The natural companion to [[redactLowCounts]] when
    * the unit of disclosure is the ROW, not an aggregate cell
    * (north-star extension; the reference stops at cell-level SDC).
    *
    * Scale shape: one hash aggregate on the quasi-identifier key (map-side
    * combined) and a broadcast-or-shuffle join back on the same key — the
    * group-size table is |distinct combinations|, usually tiny relative to
    * the data.
    */
  def kAnonymize(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Int
  ): DataFrame = {
    require(k >= 1, "k must be a positive integer.")
    require(quasiCols.nonEmpty, "At least one quasi-identifier column required.")
    quasiCols.foreach { c =>
      require(
        df.columns.contains(c),
        s"Column '$c' does not exist in the DataFrame."
      )
    }
    val bigEnough = df
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= k)
      .drop("__n")
    df.join(bigEnough, quasiCols, "left_semi")
  }

  /** The complement report: quasi-identifier combinations occurring fewer
    * than `k` times, with their sizes — what [[kAnonymize]] suppressed. */
  def kAnonymityViolations(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Int
  ): DataFrame = {
    require(k >= 1, "k must be a positive integer.")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") < k)
  }

  /** Redact values `< threshold` in the listed columns, replacing them with
    * `redactionValue` (null when None). A string redaction value implicitly
    * widens the column to string — deliberate parity with the reference
    * (`data_privacy.py:131-134`; test `tests/test_data_privacy.py:96-105`).
    * Nulls fail the `>=` comparison and are therefore redacted too.
    */
  def redactLowCounts(
      df: DataFrame,
      columns: Seq[String],
      threshold: Int,
      redactionValue: Option[Any] = None
  ): DataFrame = {
    require(threshold > 0, "Threshold must be a positive integer.")
    columns.foreach { c =>
      require(
        df.columns.contains(c),
        s"Column '$c' does not exist in the DataFrame."
      )
    }
    val replacement = redactionValue.map(lit).getOrElse(lit(null))
    // The string widening is EXPLICIT (cast the kept branch, not the
    // redaction literal): legacy-mode type coercion widened both branches
    // to string implicitly, but ANSI coercion instead tries to cast the
    // redaction string to the column type and throws at runtime — the
    // explicit cast produces the identical widened result in both modes.
    val widen = redactionValue.exists(_.isInstanceOf[String])
    columns.foldLeft(df) { (d, c) =>
      val kept =
        if (widen && d.schema(c).dataType != org.apache.spark.sql.types.StringType)
          col(c).cast("string")
        else col(c)
      d.withColumn(c, when(col(c) >= threshold, kept).otherwise(replacement))
    }
  }
}
