package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (north-star extension;
  * SURVEY.md §7 `graft.scale`).
  *
  * Scale design:
  *   - Brute force: the query set is broadcast (it is small by construction)
  *     and the corpus streams once; top-k per query is a ranking window on
  *     (query_id) — `WindowGroupLimit` keeps per-partition heaps of size k,
  *     so no full sort of the |queries| x |corpus| score table.
  *   - ANN: sign-random-projection buckets computed per-row (no shuffle),
  *     join restricted to matching buckets — the classic recall/cost dial
  *     via number of hyperplanes. IVF-style coarse quantization would slot
  *     in the same shape (bucket = nearest centroid id).
  */
object Similarity {

  /** Deterministic pseudo-random hyperplanes for sign-LSH (fixed seed —
    * identical across runs/engines; components are short decimals so SQL
    * literals parse to the same doubles). */
  def randomHyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)((rnd.nextInt(2001) - 1000) / 1000.0))
  }

  /** Exact cosine top-k neighbors for each query vector (brute force).
    *
    * @param queries  small DataFrame (query_id, query vector) — broadcast
    * @return (query_id, neighbor_id, cosine, rank) — rank 1..k, self
    *         excluded, ties broken by neighbor id
    */
  def cosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).as("__qv")
    )
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__nv"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        cosineSimilarityNative(col("__qv"), col("__nv")).as("cosine")
      )
    TopN
      .firstRow(
        scored,
        n = k,
        partitionBy = Seq(col("query_id")),
        orderBy = Seq(col("cosine").desc, col("neighbor_id")),
        returnIndexColumn = true,
        indexColumnName = "rank"
      )
  }

  /** Approximate cosine top-k: candidates restricted to the query's
    * hyperplane-LSH bucket. Lower cost, recall controlled by plane count
    * (fewer planes => bigger buckets => higher recall & cost). */
  def annTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      planes: Seq[Seq[Double]]
  ): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).as("__qv"),
      hyperplaneBucket(col(vecCol), planes).as("__bucket")
    )
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      col(vecCol).as("__nv"),
      hyperplaneBucket(col(vecCol), planes).as("__bucket")
    )
    val scored = c
      .join(broadcast(q), Seq("__bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        cosineSimilarityNative(col("__qv"), col("__nv")).as("cosine")
      )
    TopN.firstRow(
      scored,
      n = k,
      partitionBy = Seq(col("query_id")),
      orderBy = Seq(col("cosine").desc, col("neighbor_id")),
      returnIndexColumn = true,
      indexColumnName = "rank"
    )
  }
}
