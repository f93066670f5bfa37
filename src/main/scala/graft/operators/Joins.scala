package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for skewed data (north-star extension).
  *
  * AQE's skew-join split handles many cases at runtime, but when one key
  * dominates an equi-join (the classic hot-customer / null-bucket problem)
  * explicit salting keeps every task bounded: the skewed side gets a
  * deterministic salt in [0, saltFactor), the other side is replicated once
  * per salt value, and the join key becomes (key, salt). Result rows are
  * identical to the unsalted join; the shuffle fans the hot key out over
  * saltFactor reducers.
  */
object Joins {

  /** Inner equi-join with deterministic salting on `keys`.
    *
    * @param skewed     the large/skewed side (salted with one value per row)
    * @param replicated the other side (duplicated saltFactor times — keep it
    *                   the smaller input)
    * @param keys       equi-join key column names present on both sides
    * @param saltFactor number of salt buckets per key
    */
  def saltedJoin(
      skewed: DataFrame,
      replicated: DataFrame,
      keys: Seq[String],
      saltFactor: Int = 8
  ): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // deterministic per-row salt: hash every column so identical rows
    // spread only when the whole row repeats (no RNG — keeps reruns and
    // tests stable)
    val salted = skewed.withColumn(
      "__salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(saltFactor)).cast("int")
    )
    val salts = replicated.crossJoin(
      broadcast(
        salted.sparkSession.range(saltFactor).select(col("id").cast("int").as("__salt"))
      )
    )
    salted
      .join(salts, keys :+ "__salt")
      .drop("__salt")
  }
}
