package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Shared Bloom-filter build/probe plumbing for [[Decontam]] and
  * [[Joins]]: build a filter over a one-column table of xxhash64 keys,
  * return the codegen'd native `BloomFilterMightContain` probe over a
  * caller-supplied 64-bit hash expression. The subtle contract lives in
  * exactly one place: the build side `putLong`s the hashes
  * (`stat.bloomFilter` on a LongType column) and the native probe tests
  * them with `mightContainLong`, so build and probe MUST hash the same
  * value under the same Spark type — callers are responsible for feeding
  * type-identical keys to both sides (xxhash64 is type-sensitive:
  * hash(42: INT) != hash(42: BIGINT)). */
private[operators] object BloomUtils {

  /** `hashes` must be a single LongType column named `__h`. Returns the
    * probe column testing `probeHash` (an xxhash64 expression) against
    * the built filter — a broadcast-literal bit array, inside
    * whole-stage codegen, never a UDF. */
  def probeColumn(
      hashes: DataFrame,
      expected: Long,
      fpp: Double,
      probeHash: Column
  ): Column = {
    val bf = hashes.stat.bloomFilter("__h", expected, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    org.apache.spark.sql.GraftSqlBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal
          .create(bos.toByteArray, org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.GraftSqlBridge.expression(probeHash)
      )
    )
  }
}
