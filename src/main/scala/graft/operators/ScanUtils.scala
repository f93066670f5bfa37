package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared scan-parallelism guard for per-row-expensive passes. */
object ScanUtils {

  /** Spread a CPU-heavy scan across the cluster when the source supplies
    * fewer splits than cores. A small parquet file is ONE row group = ONE
    * split no matter what `maxPartitionBytes` says, so per-row-expensive
    * passes (gram featurization, wide exact-decimal aggregation)
    * serialize onto a single core at local/bench scale; a narrow-input
    * repartition unlocks the machine. At real scale input splits
    * (bytes/128 MB) vastly exceed core counts, so the branch never fires
    * and no shuffle is added. Row-order nondeterminism from the
    * round-robin repartition is safe ONLY for order-independent
    * consumers (key-based aggregates, decimal-exact sums) — every caller
    * in this library qualifies.
    */
  def withScanParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }
}
