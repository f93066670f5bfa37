package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract checks at corpus scale (north-star extension; no reference
  * counterpart — the reference's `validate_*` helpers THROW driver-side on
  * bad metadata, while these REPORT violation counts over the data itself,
  * the dbt-test / expectation-suite shape a 100 TB ingestion gate needs).
  *
  * Scale design: every scalar check (not-null, accepted-values, range,
  * regex) compiles to a conditional-sum column inside ONE shared aggregate
  * — the table is scanned once no matter how many scalar checks run.
  * Uniqueness needs its own keyed aggregate and referential integrity an
  * anti-join probe; each remains a single shuffle on its natural key, and
  * the per-check outputs are one-row frames unioned into the report.
  */
object Checks {

  sealed trait DataCheck { def label: String }

  /** Rows where `column` is null violate. */
  case class NotNull(column: String) extends DataCheck {
    def label = s"not_null:$column"
  }

  /** Rows whose `column` value (rendered as string) is outside `values`
    * violate; nulls pass (compose with [[NotNull]] to forbid them). */
  case class AcceptedValues(column: String, values: Seq[String])
      extends DataCheck {
    def label = s"accepted_values:$column"
  }

  /** Rows with `column` outside [lo, hi] violate; nulls pass. */
  case class InRange(column: String, lo: Double, hi: Double)
      extends DataCheck {
    def label = s"in_range:$column"
  }

  /** Rows whose `column` does NOT match the (RE2-portable) regex violate;
    * nulls pass. */
  case class MatchesRegex(column: String, pattern: String) extends DataCheck {
    def label = s"matches_regex:$column"
  }

  /** Every key-combination occurring more than once counts ALL its rows as
    * violations (so `n_violations` = rows living in duplicated keys). */
  case class Unique(columns: Seq[String]) extends DataCheck {
    def label = s"unique:${columns.mkString(",")}"
  }

  /** Rows whose `column` value has no match in `dim.dimColumn` violate;
    * nulls pass. The dimension side is broadcast — referential probes are
    * dimension-sized, never fact-sized. */
  case class ReferencedIn(column: String, dim: DataFrame, dimColumn: String)
      extends DataCheck {
    def label = s"referenced_in:$column"
  }

  /** Run the checks and return one row per check, in the given order:
    * (check, n_violations, passed). */
  def runChecks(df: DataFrame, checks: Seq[DataCheck]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val scalar = checks.collect {
      case c: NotNull        => c.label -> col(c.column).isNull
      case c: AcceptedValues =>
        require(c.values.nonEmpty, s"${c.label}: empty value set")
        c.label ->
          (col(c.column).isNotNull &&
            !col(c.column).cast("string").isin(c.values: _*))
      case c: InRange =>
        c.label ->
          (col(c.column).isNotNull &&
            (col(c.column).cast("double") < c.lo ||
              col(c.column).cast("double") > c.hi))
      case c: MatchesRegex =>
        c.label ->
          (col(c.column).isNotNull &&
            !col(c.column).cast("string").rlike(c.pattern))
    }
    // ONE pass for every scalar check: conditional sums share the scan
    val scalarReport: Option[DataFrame] =
      if (scalar.isEmpty) None
      else {
        val aggs = scalar.map { case (label, bad) =>
          // coalesce: sum over ZERO rows is NULL — an empty batch must
          // report 0 violations / passed=true, like the Unique branch
          coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L)).as(label)
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val entries = array(scalar.map { case (label, _) =>
          struct(lit(label).as("check"), col(label).as("n_violations"))
        }: _*)
        Some(
          one
            .select(explode(entries).as("__e"))
            .select(col("__e.check"), col("__e.n_violations"))
        )
      }
    val keyed = checks.collect {
      case c: Unique =>
        df.groupBy(c.columns.map(col): _*)
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1)
          .agg(coalesce(sum("__n"), lit(0L)).as("n_violations"))
          .select(lit(c.label).as("check"), col("n_violations"))
      case c: ReferencedIn =>
        df.filter(col(c.column).isNotNull)
          .join(
            broadcast(
              c.dim.select(col(c.dimColumn).as("__ref")).distinct()
            ),
            col(c.column) === col("__ref"),
            "left_anti"
          )
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(c.label).as("check"), col("n_violations"))
    }
    val all = (scalarReport.toSeq ++ keyed).reduce(_.unionByName(_))
    // report in the caller's check order
    val order = checks.map(_.label).zipWithIndex.toMap
    val orderCol = checks.foldLeft(lit(Int.MaxValue)) { (acc, c) =>
      when(col("check") === c.label, lit(order(c.label))).otherwise(acc)
    }
    all
      .withColumn("__ord", orderCol)
      .orderBy("__ord")
      .drop("__ord")
      .withColumn("passed", col("n_violations") === 0L)
  }
}
