package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus amplification for scale testing (north-star
  * extension; no reference counterpart).
  *
  * Every 100 TB claim made from plan shape deserves an off-happy-path
  * rehearsal: [[selfUnionSkewed]] turns an SF corpus into a `copies`x
  * larger one with re-keyed ids AND a planted hot duplicate cluster an
  * order of magnitude bigger than the rest — the worst case for LSH
  * bucketing (one bucket with every copy of the hot document) and for
  * join-key skew. StressSpec runs the dedup/LSH/join stack on the
  * amplified corpus with assertion-bounded candidate-pair counts;
  * Bench reports a rows/s throughput figure over the same corpus.
  */
object Stress {

  /** `copies` re-keyed copies of `df` plus `hotCopies` extra copies of the
    * single `hotId` row.
    *
    * Copy c re-keys `id -> id + c * idStride`; copy 0 KEEPS the original
    * ids, so the original ids are the minimum of every duplicate cluster —
    * which makes min-id dedup survivors of the amplified corpus provably
    * identical to the survivors of the original corpus (the exact oracle
    * StressSpec asserts). The hot block gets ids `copies * idStride + i`.
    *
    * Scale shape: a broadcast crossJoin against a `copies`-row table —
    * the amplified corpus is never materialized driver-side, and the
    * explode happens map-side in the tasks that read the original rows.
    *
    * @param idStride must exceed every id in `df` (ids must stay unique) */
  def selfUnionSkewed(
      df: DataFrame,
      idCol: String,
      copies: Int,
      idStride: Long,
      hotId: Long = 0L,
      hotCopies: Int = 0
  ): DataFrame = {
    require(copies >= 1, "copies must be >= 1")
    require(idStride > 0, "idStride must be positive")
    require(hotCopies >= 0, "hotCopies must be >= 0")
    val spark = df.sparkSession
    val copyTable = broadcast(
      spark.range(copies).select(col("id").as("__copy"))
    )
    val unioned = df
      .crossJoin(copyTable)
      .withColumn(idCol, col(idCol) + col("__copy") * idStride)
      .drop("__copy")
    if (hotCopies == 0) unioned
    else {
      val hotTable = broadcast(
        spark.range(hotCopies).select(col("id").as("__hot"))
      )
      val hotBlock = df
        .filter(col(idCol) === hotId)
        .crossJoin(hotTable)
        .withColumn(idCol, lit(copies.toLong * idStride) + col("__hot"))
        .drop("__hot")
      unioned.unionByName(hotBlock)
    }
  }
}
