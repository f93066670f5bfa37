package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry point. One JSON line on stdout:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"errors":{...},
  *  "ok":N,"failed":N,"runs":R,"sf":dir}
  *
  * Env knobs:
  *  - SPARK_GRAFT_SF_DIR   data directory (default /root/testdata/sf0.1)
  *  - SPARK_GRAFT_CPUS     local[N] parallelism (default 4)
  *  - SPARK_GRAFT_RUNS     measured runs per query; per-query times and the
  *    total are MEDIANS over the runs (default 3). This VM's CPU allocation
  *    is noisy (3-30x per-query swings) — medians over 3 runs make a single
  *    emitted artifact noise-robust by default; set 1 for a quick pass.
  *  - SPARK_GRAFT_WARM_DIR warmup data directory (default: sibling sf0.001
  *    of the SF dir's parent, falling back to the SF dir itself)
  *  - SPARK_GRAFT_NO_WARM  set to skip the per-query warmup pass
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: pay JVM/codegen/parquet-footer startup outside the timings so
    // the first measured query isn't charged for it
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()
    // steady-state warmup: run every query once at the smallest SF so each
    // measured run reflects the operator, not first-touch codegen + JIT of
    // its expression shapes (tokenize/explode alone costs ~20 s of one-time
    // JIT that would otherwise land on whichever query hits it first).
    // The warmup dir follows the SF dir's layout (sibling sf0.001) instead
    // of a hardcoded path, and warmup failures are LOGGED to stderr — a
    // query that only fails at warmup silently voiding the steady-state
    // premise would otherwise be invisible.
    val warmDir = sys.env.getOrElse(
      "SPARK_GRAFT_WARM_DIR", {
        val sibling = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
        if (sibling.isDirectory) sibling.getPath else sfDir
      }
    )
    if (new java.io.File(warmDir).isDirectory && sys.env.get("SPARK_GRAFT_NO_WARM").isEmpty)
      SparkEntry.queries.foreach { case (name, fn) =>
        try fn(spark, warmDir).count()
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] warmup failed for $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // a failing query must surface as an error, never as a (fast) timing;
    // with SPARK_GRAFT_RUNS > 1 each query is timed that many times and the
    // recorded figure is the per-query MEDIAN (first error wins if any run
    // fails)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val samples = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val err =
          try { fn(spark, sfDir).count(); None }
          catch { case e: Throwable => Some(e.getClass.getSimpleName + ": " + e.getMessage) }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val err = samples.collectFirst { case (_, Some(e)) => e }
      (name, median(samples.map(_._1)), err)
    }
    val qs = results
      .collect { case (k, v, None) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results
      .collect { case (k, _, Some(e)) =>
        s"\"" + k + "\":\"" + e.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200) + "\""
      }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"ok":${results.count(_._3.isEmpty)},"failed":${results.count(_._3.nonEmpty)},"runs":$runs,"sf":"$sfDir"}"""
    )
    spark.stop()
  }
}
