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
    columns.foldLeft(df) { (d, c) =>
      d.withColumn(c, when(col(c) >= threshold, col(c)).otherwise(replacement))
    }
  }
}
