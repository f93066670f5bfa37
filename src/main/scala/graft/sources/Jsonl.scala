package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-Lines corpus IO — the interchange format LLM training corpora ship
  * in (one document object per line, usually compressed). North-star
  * extension; the reference's JSON surface is whole-file configs
  * ([[JsonUtils]]), not datasets.
  *
  * Scale notes baked into the API:
  *   - ALWAYS pass a schema. Schema inference is a full extra pass over
  *     100 TB before the first real job; `schemaDdl` makes the read
  *     single-pass and enables column pruning of unparsed fields.
  *   - Malformed lines are DATA at crawl scale, not exceptions: reads run
  *     PERMISSIVE with the raw line captured in `corruptCol` (the column
  *     is part of the schema — the Spark gotcha this wrapper exists to
  *     encode), and [[corruptLineReport]] turns it into a one-row health
  *     gate.
  *   - Compression is chosen by the WRITER: gzip is universal but not
  *     splittable (parallelism = files, the WARC story), bzip2 is
  *     splittable but slow; for shard-sized files (the
  *     `Splits.writeShards` layout) per-file parallelism is already the
  *     plan, so gzip is the default.
  */
object Jsonl {

  /** Read JSONL (possibly compressed — codec auto-detected from the file
    * extension) with an explicit schema. Each malformed line yields a row
    * with every schema field NULL and the raw line in `corruptCol`;
    * well-formed lines have a NULL `corruptCol`. Pass `schemaDdl = None`
    * only for exploration: it costs a full inference pass and cannot
    * capture corrupt lines (they just widen the inferred schema). */
  def readJsonl(
      spark: SparkSession,
      path: String,
      schemaDdl: Option[String],
      corruptCol: String = "_corrupt_record"
  ): DataFrame =
    schemaDdl match {
      case Some(ddl) =>
        val schema = StructType.fromDDL(ddl)
        require(
          !schema.fieldNames.contains(corruptCol),
          s"schema already contains the corrupt-record column '$corruptCol'"
        )
        spark.read
          .schema(schema.add(corruptCol, StringType))
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", corruptCol)
          .json(path)
      case None =>
        spark.read.json(path)
    }

  /** Write a DataFrame as JSONL. `compression = None` writes plain text;
    * the default gzip matches the usual corpus-release layout. Column
    * `corruptCol` left over from a permissive read is NOT dropped
    * automatically — filter/inspect it first; writing a corpus with its
    * corrupt column still attached is almost always a bug. */
  def writeJsonl(
      df: DataFrame,
      path: String,
      compression: Option[String] = Some("gzip"),
      mode: String = "error"
  ): Unit = {
    val w = df.write.mode(mode)
    compression.fold(w)(c => w.option("compression", c)).json(path)
  }

  /** One-row read-health report over a permissive [[readJsonl]] result:
    * total lines, corrupt lines, corrupt fraction (ppm-exact), and up to
    * `sampleN` deterministically-chosen (smallest by text) corrupt lines
    * for debugging. One map-side-combined aggregate. */
  def corruptLineReport(
      df: DataFrame,
      corruptCol: String = "_corrupt_record",
      sampleN: Int = 5
  ): DataFrame = {
    require(
      df.columns.contains(corruptCol),
      s"column '$corruptCol' does not exist — read with readJsonl(schemaDdl = Some(...))"
    )
    val dataCols = df.columns.filterNot(_ == corruptCol)
    require(
      dataCols.nonEmpty,
      "df must carry at least one data column besides the corrupt column"
    )
    // Spark refuses JSON scans whose referenced column set is ONLY the
    // corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN — the parse that
    // fills it would otherwise be optimized away). Anchor one data column
    // inside a no-op coalesce: the reference survives pruning, and the
    // fallback branch never evaluates where it matters (corrupt IS NOT
    // NULL short-circuits it).
    val anchored = coalesce(col(corruptCol), col(dataCols.head).cast("string"))
    val nCorrupt = count(when(col(corruptCol).isNotNull, anchored))
    val counts = df.agg(
      count(lit(1)).as("n_lines"),
      nCorrupt.as("n_corrupt"),
      (nCorrupt * lit(1000000L) / greatest(count(lit(1)), lit(1L)))
        .cast("long")
        .as("corrupt_ppm")
    )
    // bounded sample: TakeOrdered keeps sampleN rows of state per task —
    // never a collect_set of every corrupt line on a bad day
    val samples = df
      .filter(col(corruptCol).isNotNull)
      .select(substring(anchored, 1, 200).as("__s"))
      .orderBy("__s")
      .limit(sampleN)
      .agg(collect_list(col("__s")).as("corrupt_samples"))
    counts.crossJoin(broadcast(samples))
  }
}
