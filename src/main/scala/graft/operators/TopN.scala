package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-N-per-group selection via window ranking.
  *
  * Capability parity with the reference's data-aggregation surface
  * (reference: `src/hds_functions/data_aggregation.py:15-246`): `selectTopRows`
  * with methods `row_number` / `rank` / `dense_rank`, plus the three wrappers.
  *
  * Scale notes:
  *   - The only shuffle is the hash exchange on `partitionBy`. With ordering
  *     present, Catalyst (Spark >= 3.5, `InferWindowGroupLimit`) rewrites
  *     `filter(rank <= n)` over a ranking window into `WindowGroupLimit` —
  *     a per-partition top-k that never materializes the full sort. Verified
  *     by plan assertion in `TopNSpec`.
  *   - When `partitionBy` is empty the reference adds a `_dummy_column`
  *     constant partition; all rows land in ONE task. We replicate the
  *     semantics (including the collision guard) for parity — callers at
  *     scale should always partition, or accept the single-task global top-k
  *     (which WindowGroupLimit still reduces to a streaming top-n per map
  *     partition before the final single-partition pass).
  */
object TopN {

  val RowNumber = "row_number"
  val Rank = "rank"
  val DenseRank = "dense_rank"

  /** Select top `n` rows per partition using the given ranking method.
    * Mirrors reference `data_aggregation.py:15-101` including the
    * `_dummy_column` global-partition behavior and its collision guard.
    *
    * Null ordering follows Spark defaults (nulls smallest ascending); pass
    * explicit `asc_nulls_last` / `desc_nulls_first` columns to override.
    */
  def selectTopRows(
      df: DataFrame,
      method: String,
      n: Int = 1,
      partitionBy: Seq[Column] = null,
      orderBy: Seq[Column] = null,
      returnIndexColumn: Boolean = false,
      indexColumnName: String = "row_index"
  ): DataFrame = {
    require(
      Seq(RowNumber, Rank, DenseRank).contains(method),
      "Invalid method. Allowed values are 'row_number', 'rank', and 'dense_rank'."
    )
    require(n > 0, "n must be a positive, non-zero integer")

    val (df1, parts, usedDummy) =
      if (partitionBy == null) {
        require(
          !df.columns.contains("_dummy_column"),
          "DataFrame already contains '_dummy_column', cannot add dummy partition column."
        )
        (df.withColumn("_dummy_column", lit(1)), Seq(col("_dummy_column")), true)
      } else (df, partitionBy, false)

    val base = Window.partitionBy(parts: _*)
    val spec = if (orderBy != null) base.orderBy(orderBy: _*) else base

    val ranked = method match {
      case RowNumber => df1.withColumn(indexColumnName, row_number().over(spec))
      case Rank      => df1.withColumn(indexColumnName, rank().over(spec))
      case DenseRank => df1.withColumn(indexColumnName, dense_rank().over(spec))
    }

    var out = ranked.filter(col(indexColumnName) <= n)
    if (!returnIndexColumn) out = out.drop(indexColumnName)
    if (usedDummy) out = out.drop("_dummy_column")
    out
  }

  /** First `n` rows per partition by sort order (ties broken arbitrarily by
    * row_number). Reference `data_aggregation.py:104-148`. */
  def firstRow(
      df: DataFrame,
      n: Int = 1,
      partitionBy: Seq[Column] = null,
      orderBy: Seq[Column] = null,
      returnIndexColumn: Boolean = false,
      indexColumnName: String = "row_index"
  ): DataFrame =
    selectTopRows(df, RowNumber, n, partitionBy, orderBy, returnIndexColumn, indexColumnName)

  /** All rows in the top `n` ranks per partition (ties kept, rank gaps).
    * Reference `data_aggregation.py:151-194`. */
  def firstRank(
      df: DataFrame,
      n: Int = 1,
      partitionBy: Seq[Column] = null,
      orderBy: Seq[Column] = null,
      returnIndexColumn: Boolean = false,
      indexColumnName: String = "rank_index"
  ): DataFrame =
    selectTopRows(df, Rank, n, partitionBy, orderBy, returnIndexColumn, indexColumnName)

  /** All rows in the top `n` dense ranks per partition (ties kept, no gaps).
    * Reference `data_aggregation.py:197-246`. */
  def firstDenseRank(
      df: DataFrame,
      n: Int = 1,
      partitionBy: Seq[Column] = null,
      orderBy: Seq[Column] = null,
      returnIndexColumn: Boolean = false,
      indexColumnName: String = "dense_rank_index"
  ): DataFrame =
    selectTopRows(df, DenseRank, n, partitionBy, orderBy, returnIndexColumn, indexColumnName)

  /** Exact heavy hitters: the `k` most frequent `valueCol` values within
    * each group, with their counts (`n`) and rank. Ties break toward the
    * smaller value for determinism (north-star extension — the
    * "top domains per language" / "top event types per user" shape).
    *
    * Scale shape: one map-side-combined hash aggregate on
    * (group, value) — the only pass over the full data — then a
    * WindowGroupLimit top-k over the much smaller (group, value) count
    * table. No global sort, no per-group collect; a group with a billion
    * rows but few distinct values costs one combiner cell per value.
    */
  def heavyHitters(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(groupCols.nonEmpty, "at least one group column")
    val counts = df
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("n"))
    firstRow(
      counts,
      n = k,
      partitionBy = groupCols.map(col),
      orderBy = Seq(col("n").desc, col(valueCol)),
      returnIndexColumn = true,
      indexColumnName = "rank"
    )
  }
}
