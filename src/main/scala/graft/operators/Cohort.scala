package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort construction: ordered inclusion-criteria filtering with an
  * attrition-flowchart audit table.
  *
  * Capability parity with the reference's cohort surface
  * (reference: `src/hds_functions/cohort_construction.py:25-297`).
  *
  * Criteria are an *ordered* `Seq[(flagColumn, sqlExpression)]` — the
  * flowchart steps follow insertion order, like the reference's Python dict.
  *
  * Scale notes:
  *   - Criteria evaluation is a stack of `Project`s over the scan (Catalyst
  *     collapses them); the final `filter(include)` pushes deterministic
  *     predicates into the parquet scan. No shuffle on the filter path.
  *   - The flowchart aggregates over an unpivot: one hash-aggregate shuffle
  *     keyed by criterion (N+1 distinct keys), then a broadcast join to the
  *     tiny metadata table and a single-task window over ≤ N+1 rows —
  *     negligible at any input size.
  */
object Cohort {

  /** Add one boolean flag column per criterion (nulls → false), cumulative
    * AND columns `criteria_0..N` (`criteria_0` = true), and the final
    * `include` column. Mirrors reference `cohort_construction.py:92-128`. */
  def createInclusionColumns(
      cohort: DataFrame,
      inclusionCriteria: Seq[(String, String)]
  ): DataFrame = {
    val flagged = inclusionCriteria.foldLeft(cohort) {
      case (df, (name, sql)) => df.withColumn(name, expr(sql))
    }
    val filled = flagged.na.fill(false, inclusionCriteria.map(_._1))
    val withBase = filled.withColumn("criteria_0", lit(true))
    val cumulative = inclusionCriteria.map(_._1).zipWithIndex.foldLeft(withBase) {
      case (df, (name, i)) =>
        df.withColumn(s"criteria_${i + 1}", col(s"criteria_$i") && col(name))
    }
    cumulative.withColumn("include", col(s"criteria_${inclusionCriteria.size}"))
  }

  /** Attrition flowchart: one row per criterion step with surviving row /
    * distinct-person counts and deltas vs the previous step.
    * Mirrors reference `cohort_construction.py:131-217`:
    * unpivot criteria columns → conditional count + distinct-count aggregate
    * → broadcast left join to criterion metadata → lag window over the
    * (≤ N+1 row) result → ordered projection.
    */
  def createInclusionFlowchart(
      cohortFlagged: DataFrame,
      inclusionCriteria: Seq[(String, String)],
      rowIdCol: String = "row_id",
      personIdCol: String = "person_id"
  ): DataFrame = {
    val spark: SparkSession = cohortFlagged.sparkSession
    import spark.implicits._

    val criteriaColumns = (0 to inclusionCriteria.size).map(i => s"criteria_$i")

    val meta = (("criteria_0", "Original table", "") +:
      inclusionCriteria.zipWithIndex.map { case ((k, v), i) =>
        (s"criteria_${i + 1}", k, v)
      }).toDF("criteria", "description", "expression")

    val idCols = Seq(rowIdCol, personIdCol)
    val selected = cohortFlagged.select((idCols ++ criteriaColumns).map(col): _*)

    val unpivoted = selected.unpivot(
      idCols.map(col).toArray,
      criteriaColumns.map(col).toArray,
      "criteria",
      "passed"
    )

    val aggregated = unpivoted
      .groupBy("criteria")
      .agg(
        count(when(col("passed"), 1)).as("n_row"),
        countDistinct(when(col("passed"), col(personIdCol))).as("n_distinct_id")
      )

    val withMeta = aggregated.join(broadcast(meta), Seq("criteria"), "left")

    val withIndex = withMeta.withColumn(
      "criteria_index",
      regexp_extract(col("criteria"), "\\d+", 0).cast("int")
    )

    // Unpartitioned window: fine — at most N+1 rows reach it.
    val w = Window.orderBy("criteria_index")
    val withDeltas = withIndex
      .withColumn(
        "excluded_rows",
        (lag("n_row", 1).over(w) - col("n_row")).cast("int")
      )
      .withColumn(
        "excluded_ids",
        (lag("n_distinct_id", 1).over(w) - col("n_distinct_id")).cast("int")
      )

    withDeltas
      .select(
        "criteria_index", "criteria", "description", "expression",
        "n_row", "n_distinct_id", "excluded_rows", "excluded_ids"
      )
      .orderBy("criteria_index")
  }

  /** Apply the criteria: flag, optionally emit the flowchart via
    * `flowchartSink`, filter to rows passing everything, and optionally drop
    * the working columns. Mirrors reference `cohort_construction.py:25-89`
    * with the side-effecting `save_table` generalized into a sink callback
    * (`graft.sources.Tables.saveTable(_, key, dir)` reproduces the reference
    * behavior exactly).
    */
  def applyInclusionCriteria(
      cohort: DataFrame,
      inclusionCriteria: Seq[(String, String)],
      flowchartSink: Option[DataFrame => Unit] = None,
      rowIdCol: String = "row_id",
      personIdCol: String = "person_id",
      dropInclusionFlags: Boolean = true
  ): DataFrame = {
    validateInclusionCriteria(cohort, inclusionCriteria)
    validateCohortColumns(cohort, inclusionCriteria, rowIdCol, personIdCol)

    val flagged = createInclusionColumns(cohort, inclusionCriteria)

    flowchartSink.foreach { sink =>
      sink(
        createInclusionFlowchart(flagged, inclusionCriteria, rowIdCol, personIdCol)
      )
    }

    // Filter on the raw criteria conjunction rather than the filled
    // `include` column: same row set (NULL excludes either way), but the
    // raw deterministic predicates push down into the parquet scan, whereas
    // the na.fill coalesce(pred, false) form blocks PushedFilters entirely
    // (verified by PlanSpec) — a full-scan difference at 100 TB.
    //
    // Re-evaluating the raw expressions is only sound when they are
    // deterministic; with e.g. rand()-based sampling criteria the surviving
    // rows could disagree with their flag columns, so those fall back to
    // filtering on the computed `include` flag (no pushdown — correct over
    // fast, and Catalyst would refuse to push a non-deterministic predicate
    // anyway).
    val rawExprs = inclusionCriteria.map { case (_, sql) => expr(sql) }
    val allDeterministic = inclusionCriteria.isEmpty ||
      cohort
        .select(rawExprs: _*)
        .queryExecution
        .analyzed
        .expressions
        .forall(_.deterministic)
    val filtered =
      if (inclusionCriteria.isEmpty) flagged
      else if (allDeterministic) flagged.filter(rawExprs.reduce(_ && _))
      else flagged.filter(col("include"))

    if (dropInclusionFlags) {
      val toDrop = (0 to inclusionCriteria.size).map(i => s"criteria_$i") ++
        inclusionCriteria.map(_._1) :+ "include"
      filtered.drop(toDrop: _*)
    } else filtered
  }

  /** Structural validation of the criteria seq (names/exprs non-null,
    * non-empty; names unique). Scala's types cover the reference's dict
    * type checks (`cohort_construction.py:220-246`); uniqueness matters
    * here because we accept a Seq where Python had dict keys. */
  def validateInclusionCriteria(
      cohort: DataFrame,
      inclusionCriteria: Seq[(String, String)]
  ): Unit = {
    require(
      inclusionCriteria != null,
      "The inclusion_criteria must be a sequence of (criteria column name, SQL expression) pairs."
    )
    inclusionCriteria.foreach { case (k, v) =>
      require(
        k != null && k.nonEmpty && v != null,
        s"The SQL expression for inclusion criteria '$k' must be a non-null string."
      )
    }
    val names = inclusionCriteria.map(_._1)
    require(
      names.distinct.size == names.size,
      s"Duplicate criteria names: ${names.diff(names.distinct).distinct.mkString(", ")}"
    )
  }

  /** Reject conflicting pre-existing columns (`criteria_*`, `include`,
    * criterion names) and require the id columns. Mirrors reference
    * `cohort_construction.py:249-297` (its AnalysisException for missing id
    * columns becomes IllegalArgumentException here). */
  def validateCohortColumns(
      cohort: DataFrame,
      inclusionCriteria: Seq[(String, String)],
      rowIdCol: String,
      personIdCol: String
  ): Unit = {
    val cohortColumns = cohort.columns.toSet
    val forbidden =
      cohortColumns.filter(_.startsWith("criteria_")) ++ Set("include") ++
        inclusionCriteria.map(_._1).toSet
    val conflicting = forbidden.intersect(cohortColumns)
    require(
      conflicting.isEmpty,
      s"The cohort DataFrame contains conflicting columns: ${conflicting.mkString(", ")}"
    )
    val missing = Seq(rowIdCol, personIdCol).filterNot(cohortColumns.contains)
    require(
      missing.isEmpty,
      s"Missing required columns: ${missing.mkString(", ")}"
    )
  }
}
