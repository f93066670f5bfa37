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
    * capture corrupt lines (they just widen the inferred schema).
    *
    * `.zst` patterns (the Dolma/RedPajama shard convention) route
    * through [[zstLines]]: Hadoop has no zstd codec without native libs,
    * so lines are streamed per file through zstd-jni and parsed by the
    * SAME schema'd PERMISSIVE json read — corrupt-LINE capture is
    * identical to the gzip path by construction, and a corrupt FRAME
    * fails its task with the file named (exactly what a truncated .gz
    * does on the built-in path). Like gzip, zstd JSONL is read
    * file-at-a-time (parallelism = shard count — the corpus layout
    * already shard-sizes files). */
  def readJsonl(
      spark: SparkSession,
      path: String,
      schemaDdl: Option[String],
      corruptCol: String = "_corrupt_record"
  ): DataFrame = {
    def parse(read: org.apache.spark.sql.DataFrameReader => DataFrame): DataFrame =
      schemaDdl match {
        case Some(ddl) =>
          val schema = StructType.fromDDL(ddl)
          require(
            !schema.fieldNames.contains(corruptCol),
            s"schema already contains the corrupt-record column '$corruptCol'"
          )
          read(
            spark.read
              .schema(schema.add(corruptCol, StringType))
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", corruptCol)
          )
        case None => read(spark.read)
      }
    if (path.endsWith(".zst")) {
      val lines = zstLines(spark, path)
      parse(_.json(lines))
    } else parse(_.json(path))
  }

  /** Explicit-listing [[readJsonl]] — the composition point for
    * resumable batch ingest over JSONL corpora:
    * `Ingest.pendingFiles(...)` → readJsonlFor → sink →
    * `Ingest.commitFiles(...)` (the [[Warc.readWarcFor]] split applied
    * to the dominant corpus format). Every listed file streams through
    * a per-file reader with the codec sniffed from MAGIC BYTES (zstd
    * 28 B5 2F FD, gzip 1F 8B, else plain text) — extension-agnostic,
    * so a mislabeled shard still reads; the lines feed the same
    * schema'd PERMISSIVE parse as [[readJsonl]]. Tradeoff vs the
    * glob-based read: plain-text files lose within-file splitting
    * (parallelism = files) — irrelevant for shard-sized corpus files,
    * which is what an ingest ledger lists. */
  def readJsonlFor(
      files: DataFrame,
      schemaDdl: Option[String],
      corruptCol: String = "_corrupt_record",
      pathCol: String = "path"
  ): DataFrame = {
    require(files.columns.contains(pathCol), s"column '$pathCol' does not exist")
    val spark = files.sparkSession
    import spark.implicits._
    val confEntries = Warc.hadoopConfEntries(spark)
    val lines = files
      .select(org.apache.spark.sql.functions.col(pathCol).cast("string"))
      .as[String]
      .flatMap(p => lineIterator(p, confEntries))
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
          .json(lines)
      case None => spark.read.json(lines)
    }
  }

  /** One decompressed text line per row from `.jsonl.zst` shards:
    * binaryFile supplies only the LISTING (the [[Warc]] reader split);
    * bytes stream per file through zstd-jni's `ZstdInputStream` over a
    * Hadoop `FileSystem` stream — one 64 KB buffer and one line in task
    * memory, never a whole shard. Streams close on task completion and
    * on exhaustion. */
  private def zstLines(
      spark: SparkSession,
      pattern: String
  ): org.apache.spark.sql.Dataset[String] = {
    import spark.implicits._
    val confEntries = Warc.hadoopConfEntries(spark)
    spark.read
      .format("binaryFile")
      .load(pattern)
      .select("path")
      .as[String]
      .flatMap(p => lineIterator(p, confEntries))
  }

  /** Per-file streaming line iterator, codec sniffed from magic bytes:
    * zstd (28 B5 2F FD) and gzip (1F 8B) decompress through the
    * matching stream, anything else reads as plain UTF-8 text. */
  private def lineIterator(
      path: String,
      confEntries: Array[(String, String)]
  ): Iterator[String] = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    val p = new org.apache.hadoop.fs.Path(path)
    val raw = p.getFileSystem(conf).open(p)
    val reader =
      try {
        val buffered = new java.io.BufferedInputStream(raw, 1 << 16)
        buffered.mark(4)
        val magic = new Array[Int](4)
        var i = 0
        while (i < 4) { magic(i) = buffered.read(); i += 1 }
        buffered.reset()
        val decoded: java.io.InputStream =
          if (magic(0) == 0x28 && magic(1) == 0xb5 && magic(2) == 0x2f &&
            magic(3) == 0xfd)
            new com.github.luben.zstd.ZstdInputStream(buffered)
          else if (magic(0) == 0x1f && magic(1) == 0x8b)
            new java.util.zip.GZIPInputStream(buffered, 1 << 16)
          else buffered
        new java.io.BufferedReader(
          new java.io.InputStreamReader(
            decoded,
            java.nio.charset.StandardCharsets.UTF_8),
          1 << 16)
      } catch {
        case e: Throwable =>
          try raw.close()
          catch { case _: Exception => () }
          throw e
      }
    var closed = false
    def close(): Unit = if (!closed) {
      closed = true
      try reader.close()
      catch { case _: Exception => () }
    }
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => close())
    )
    new Iterator[String] {
      private var nextLine: String = null
      private def fetch(): Unit =
        if (nextLine == null && !closed) {
          nextLine =
            try reader.readLine()
            catch {
              case e: java.io.IOException =>
                close()
                throw new java.io.IOException(
                  s"corrupt compressed stream in $path: ${e.getMessage}", e)
            }
          if (nextLine == null) close()
        }
      override def hasNext: Boolean = { fetch(); nextLine != null }
      override def next(): String = {
        fetch()
        if (nextLine == null) throw new NoSuchElementException(path)
        val l = nextLine
        nextLine = null
        l
      }
    }
  }

  /** Streaming [[readJsonl]]: new JSONL shards landing in `dir` become
    * parsed rows — corpus ingestion is file-arrival-driven, and the
    * per-file parse is stateless, so the stream composes directly with
    * the streaming dedup/quality/decontamination gates. Same per-file
    * magic-sniffed codec handling as [[readJsonlFor]] (zstd / gzip /
    * plain), same PERMISSIVE corrupt-line capture (via `from_json` —
    * the streaming-side twin of the batch reader's parse, identical
    * semantics, asserted in the suite). A schema is REQUIRED: inference
    * over an unbounded stream is not a thing. */
  def readJsonlStream(
      spark: SparkSession,
      dir: String,
      schemaDdl: String,
      corruptCol: String = "_corrupt_record"
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import spark.implicits._
    val schema = StructType.fromDDL(schemaDdl)
    require(
      !schema.fieldNames.contains(corruptCol),
      s"schema already contains the corrupt-record column '$corruptCol'"
    )
    val full = schema.add(corruptCol, StringType)
    val fileSchema = StructType(
      Seq(
        StructField("path", StringType),
        StructField("modificationTime", TimestampType),
        StructField("length", LongType),
        StructField("content", BinaryType)
      )
    )
    val confEntries = Warc.hadoopConfEntries(spark)
    // path-only projection: binaryFile is the file-arrival tracker,
    // never the byte source (the Warc streaming-reader split)
    spark.readStream
      .format("binaryFile")
      .schema(fileSchema)
      .load(dir)
      .select("path")
      .as[String]
      .flatMap(p => lineIterator(p, confEntries))
      .select(
        from_json(
          col("value"),
          full,
          Map(
            "mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> corruptCol
          )
        ).as("__j")
      )
      .select(full.fieldNames.map(f => col(s"__j.`$f`")): _*)
  }

  /** Write a DataFrame as JSONL. `compression = None` writes plain text;
    * the default gzip matches the usual corpus-release layout, and
    * `Some("zstd")` writes `.jsonl.zst` shards (the current Dolma /
    * RedPajama convention) through zstd-jni — Hadoop's own zstd codec
    * needs native libs, so the built-in json sink cannot. The zstd path
    * serializes rows with the SAME machinery as the built-in sink
    * (`df.toJSON` = JacksonGenerator) and writes one
    * `part-NNNNN.jsonl.zst` per non-empty partition via a streaming
    * `FileSystem` output — size shards by partitioning the input. Only
    * `error` and `overwrite` modes there (the append/ignore family is
    * the built-in committer's business). Column `corruptCol` left over
    * from a permissive read is NOT dropped automatically —
    * filter/inspect it first; writing a corpus with its corrupt column
    * still attached is almost always a bug. */
  def writeJsonl(
      df: DataFrame,
      path: String,
      compression: Option[String] = Some("gzip"),
      mode: String = "error"
  ): Unit =
    if (compression.exists(c => c.equalsIgnoreCase("zstd") || c.equalsIgnoreCase("zst"))) {
      writeJsonlZst(df, path, mode)
    } else {
      val w = df.write.mode(mode)
      compression.fold(w)(c => w.option("compression", c)).json(path)
    }

  private def writeJsonlZst(df: DataFrame, path: String, mode: String): Unit = {
    val spark = df.sparkSession
    val confEntries = Warc.hadoopConfEntries(spark)
    val dirPath = new org.apache.hadoop.fs.Path(path)
    val fs = {
      val conf = new org.apache.hadoop.conf.Configuration(false)
      confEntries.foreach { case (k, v) => conf.set(k, v) }
      dirPath.getFileSystem(conf)
    }
    mode match {
      case "overwrite" => if (fs.exists(dirPath)) fs.delete(dirPath, true)
      case "error" | "errorifexists" =>
        require(!fs.exists(dirPath), s"path $path already exists (mode=error)")
      case m =>
        throw new IllegalArgumentException(
          s"zstd writer supports modes error/overwrite, got '$m'")
    }
    fs.mkdirs(dirPath)
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      if (it.hasNext) {
        val pid = Option(org.apache.spark.TaskContext.get())
          .map(_.partitionId())
          .getOrElse(0)
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val p = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.jsonl.zst")
        val out = p.getFileSystem(conf).create(p, true)
        val w = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(
            new com.github.luben.zstd.ZstdOutputStream(out),
            java.nio.charset.StandardCharsets.UTF_8),
          1 << 16)
        try it.foreach { line => w.write(line); w.write('\n') }
        finally w.close()
      }
    }
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
