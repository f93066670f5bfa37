package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Resumable batch-ingest ledger — the processed-file manifest that makes
  * re-runs over a grown file set incremental. A 100k-file crawl-ingest job
  * that dies at file 60k must not reprocess 60k files on the next run;
  * streaming ingestion gets this from checkpointed file tracking
  * ([[Warc.readWarcStream]]), batch jobs get it from this ledger:
  *
  *   1. [[pendingFiles]] lists the input pattern and anti-joins the ledger
  *      on (path, mtime) — unseen files AND files whose mtime changed
  *      since they were recorded re-qualify;
  *   2. the caller processes only the pending files (e.g.
  *      [[Warc.readWarcFor]] over the listing) and sinks the results;
  *   3. [[commitFiles]] appends the batch to the ledger (path, mtime_ms,
  *      length, n_records, committed batch id) AFTER the sink succeeds.
  *
  * Crash semantics are at-least-once by construction: commit happens after
  * the sink, so a crash between them reprocesses that batch — pair with an
  * idempotent sink (overwrite-by-partition, dedup-on-load, or
  * [[graft.streaming.Streaming]]'s durable signature store). The ledger is
  * file METADATA (one row per file — ~100k rows for a 100 TB crawl), so
  * the anti-join broadcasts the ledger side and the listing never touches
  * file contents (`binaryFile` serves path/mtime/length from file status).
  */
object Ingest {

  /** List files matching `pattern` as (path, mtime_ms, length) without
    * reading a byte (binaryFile status-only projection — the
    * [[Warc.readWarc]] listing trick). */
  def listFiles(spark: SparkSession, pattern: String): DataFrame =
    spark.read
      .format("binaryFile")
      .load(pattern)
      .select(
        col("path"),
        unix_millis(col("modificationTime")).as("mtime_ms"),
        col("length")
      )

  /** The ledger contents: one row per committed file —
    * (path, mtime_ms, length, n_records, batch_id). Empty (with the full
    * schema) when nothing has been committed yet. */
  def ledger(spark: SparkSession, ledgerDir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, mtime_ms BIGINT, length BIGINT, " +
        "n_records BIGINT, batch_id BIGINT")
    try {
      val df = spark.read.schema(schema).parquet(ledgerDir)
      // force the listing so a missing dir fails HERE, not lazily
      df.queryExecution.toRdd.getNumPartitions
      df
    } catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  /** Files matching `pattern` that the ledger has NOT committed at their
    * current mtime: new files and touched/regrown files. The re-run entry
    * point — process these, then [[commitFiles]] them.
    *
    * The result is EAGERLY MATERIALIZED (localCheckpoint): the listing and
    * anti-join run exactly once, here, and every later use — the
    * processing read AND the [[commitFiles]] append — sees this frozen
    * snapshot. Without the pin, a lazy plan would re-list the pattern at
    * commit time, so files that land (or are touched) between the sink
    * action and the commit would be marked committed without ever being
    * processed, silently breaking the at-least-once guarantee. The
    * checkpoint is session-local and file-metadata-sized; a crash before
    * commit just re-lists on the next run. */
  def pendingFiles(
      spark: SparkSession,
      pattern: String,
      ledgerDir: String
  ): DataFrame =
    listFiles(spark, pattern)
      .join(
        ledger(spark, ledgerDir).select("path", "mtime_ms"),
        Seq("path", "mtime_ms"),
        "left_anti"
      )
      .localCheckpoint(true)

  /** Append a processed batch to the ledger. `files` is a
    * (path, mtime_ms, length) listing (what [[pendingFiles]] returned);
    * `counts`, when given, is a (path, n_records) frame — e.g.
    * `records.groupBy("path").count().withColumnRenamed("count",
    * "n_records")` from the processed batch — joined in so the ledger
    * doubles as an ingest audit (-1 when not supplied). `batchId` is any
    * monotonic run identifier the caller chooses (wall-clock ms, a job
    * counter); it only aids auditing, resume keys on (path, mtime_ms).
    * EAGER (the append happens before this returns). Call AFTER the
    * batch's sink succeeds — committing first would turn a crash into
    * silent data loss instead of harmless reprocessing. */
  def commitFiles(
      files: DataFrame,
      ledgerDir: String,
      batchId: Long,
      counts: Option[DataFrame] = None
  ): Unit = {
    Seq("path", "mtime_ms", "length").foreach { c =>
      require(files.columns.contains(c), s"column '$c' does not exist")
    }
    counts.foreach { c =>
      require(c.columns.contains("path") && c.columns.contains("n_records"),
        "counts must have (path, n_records) columns")
    }
    val withCounts = counts match {
      case Some(c) =>
        files
          .select("path", "mtime_ms", "length")
          .join(c.select(col("path"),
            col("n_records").cast("long").as("n_records")), Seq("path"), "left")
          .withColumn("n_records", coalesce(col("n_records"), lit(-1L)))
      case None =>
        files
          .select("path", "mtime_ms", "length")
          .withColumn("n_records", lit(-1L))
    }
    withCounts
      .withColumn("batch_id", lit(batchId))
      // ledger rows are file-metadata-sized; one shard per commit keeps
      // the ledger dir at one small file per batch, not one per task
      .coalesce(1)
      .write
      .mode("append")
      .parquet(ledgerDir)
  }
}
