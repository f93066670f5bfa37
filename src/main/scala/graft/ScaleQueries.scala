package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** North-star scale queries (dedup / similarity / text analysis /
  * sessionization / TPC-H-style analytics) and their DuckDB oracles.
  *
  * Oracle parity tactics:
  *   - hashes are md5 hex (portable), string mins are ASCII-safe;
  *   - double aggregation goes through DECIMAL (order-independent exact) or
  *     sequential array folds identical on both engines;
  *   - integer-typed columns are cast to matching widths (Spark `size` /
  *     `row_number` are INT32; DuckDB `len`/`row_number` BIGINT);
  *   - deterministic ORDER BY everywhere.
  */
object ScaleQueries {

  /** Canonical batch loader for the events table (normalizes the
    * driver's three shipped timestamp physical types); see
    * [[QueryShared.events]]. */
  def events(spark: SparkSession, dir: String): DataFrame =
    QueryShared.events(spark, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    TpchQueries.queries ++
      DedupQueries.queries ++
      SimilarityQueries.queries ++
      TextQueries.queries ++
      EventQueries.queries ++
      StatsQueries.queries ++
      SplitQueries.queries

  val oracles: Map[String, String] =
    TpchQueries.oracles ++
      DedupQueries.oracles ++
      SimilarityQueries.oracles ++
      TextQueries.oracles ++
      EventQueries.oracles ++
      StatsQueries.oracles ++
      SplitQueries.oracles
}
