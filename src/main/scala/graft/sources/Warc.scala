package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, EOFException, InputStream, PushbackInputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (Web ARChive, ISO 28500) reader — the container format web crawls
  * ship in (Common Crawl publishes ~1 GB `.warc.gz` segments), and the true
  * FIRST stage of a crawl pipeline: WARC → HTTP payload → HTML → text →
  * quality/dedup. North-star extension; no reference counterpart
  * (SURVEY.md §7 `graft.scale`).
  *
  * Format: a WARC file is a sequence of records, each a `WARC/1.x` version
  * line, CRLF-separated named headers, a blank line, exactly
  * `Content-Length` payload bytes, then a blank-line separator. Crawl WARCs
  * are usually gzip with ONE MEMBER PER RECORD concatenated back-to-back —
  * legal gzip that the JDK inflater walks transparently.
  *
  * Scale shape: gzip is not block-splittable, so the unit of parallelism is
  * the FILE — exactly how production crawl jobs run (Common Crawl segments
  * are sized ~1 GB for this reason; a 100 TB crawl is ~100k files, far more
  * splits than executors). The `binaryFile` source supplies ONLY the
  * listing (glob expansion, per-file splits, small-file packing by
  * `maxPartitionBytes`): the scan projects just `path`, which binaryFile
  * serves from file status without reading a byte — so neither its 2 GB
  * per-file cap nor its whole-file `content` buffer applies. Each task then
  * opens a Hadoop `FileSystem` stream per file and decodes records one at a
  * time through a bounded iterator: task memory holds ONE record body
  * (≤ [[MaxRecordBytes]]) plus a 64 KB read buffer — never the file. At 32
  * concurrent tasks over ~1 GB segments that is ~2 MB of input buffers, not
  * ~32 GB. No shuffle — rows flow straight into downstream per-row
  * operators. Streams close at iterator end AND via a task-completion
  * listener, so early-terminating plans (limits, failures) leak nothing.
  *
  * For gated access patterns, [[fetchWarcRecords]] composes with
  * [[readCdxj]]: filter the (~1000x smaller) capture index first, then
  * range-read ONLY the gated records' gzip members by (filename, offset,
  * length) — the production Common Crawl pattern that avoids decompressing
  * whole segments for a sparse selection.
  *
  * Parsing is deliberately tolerant: leading garbage before the next
  * `WARC/` magic is skipped, a record with a missing/invalid
  * `Content-Length` aborts only its FILE's remainder (the stream cannot be
  * re-synced without it), and header continuation lines are folded per the
  * spec. Header names are case-insensitive.
  */
object Warc {

  @transient private lazy val warcLog =
    org.slf4j.LoggerFactory.getLogger("graft.sources.Warc")

  /** Per-SparkContext named accumulators counting silently-skipped inputs —
    * the observability channel for the reader's deliberate skip-don't-fail
    * policy (one rotten segment in a 100k-file job must not kill the stage,
    * but the loss has to be countable). `skipped_files` counts whole files
    * the batch/stream readers could not open (after one retry for
    * transient, non-FileNotFound IO errors); `skipped_captures` counts
    * index captures [[fetchWarcRecords]] could not range-read. Named, so
    * they also surface in the Spark UI per job. Weak keys: a stopped
    * context's accumulators are collectable.
    *
    * PRECISION: the updates happen inside transformations (the readers are
    * mapPartitions/flatMap iterators), and Spark guarantees exactly-once
    * accumulator updates only in ACTIONS — a retried or speculatively
    * re-executed task re-counts its skips. Read these as an UPPER BOUND on
    * loss: exact on a clean run, and an over-count never hides a loss.
    * Turn `spark.speculation` off when the exact tally matters. */
  private val skipAccs =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[
        org.apache.spark.SparkContext,
        (org.apache.spark.util.LongAccumulator,
         org.apache.spark.util.LongAccumulator)]())

  private def accPair(spark: SparkSession)
      : (org.apache.spark.util.LongAccumulator,
         org.apache.spark.util.LongAccumulator) = {
    val sc = spark.sparkContext
    skipAccs.synchronized {
      var p = skipAccs.get(sc)
      if (p == null) {
        p = (sc.longAccumulator("graft.warc.skipped_files"),
             sc.longAccumulator("graft.warc.skipped_captures"))
        skipAccs.put(sc, p)
      }
      p
    }
  }

  /** Count of WARC files skipped as unreadable by this session's readers
    * (see [[skippedCaptures]] for the range-fetch equivalent). */
  def skippedFiles(spark: SparkSession): org.apache.spark.util.LongAccumulator =
    accPair(spark)._1

  /** Count of CDXJ captures [[fetchWarcRecords]] skipped as unreadable. */
  def skippedCaptures(spark: SparkSession): org.apache.spark.util.LongAccumulator =
    accPair(spark)._2

  /** The skip counters as a one-row DataFrame
    * `(skipped_files BIGINT, skipped_captures BIGINT)` — the pipeline-
    * facing view of the accumulators above (no accumulator names to know,
    * joinable/unionable into a job's own health report). Values are
    * SESSION-CUMULATIVE as of the actions that have completed when this is
    * called, and approximate under task retries/speculation (upper bound —
    * see the accumulator doc). Read it AFTER the ingest action, not before.
    */
  def skipReport(spark: SparkSession): DataFrame = {
    val (files, captures) = accPair(spark)
    import spark.implicits._
    Seq((files.value.longValue, captures.value.longValue))
      .toDF("skipped_files", "skipped_captures")
  }

  /** Log [[skipReport]] at WARN when any input was skipped (INFO when the
    * tally is clean) — the zero-setup observability hook pipelines call
    * after their ingest action. `context` names the caller in the line. */
  def logSkipReport(spark: SparkSession, context: String): Unit = {
    val (files, captures) = accPair(spark)
    val f = files.value.longValue
    val c = captures.value.longValue
    val msg = s"[$context] WARC skip tally (session-cumulative, upper " +
      s"bound under retries): skipped_files=$f skipped_captures=$c"
    if (f > 0 || c > 0) warcLog.warn(msg) else warcLog.info(msg)
  }

  /** One parsed WARC record. `payload` is the raw record block; for
    * `application/http` records (and `parseHttp = true`), `http_status` /
    * `http_content_type` come from the embedded HTTP message and `body` is
    * the payload with HTTP headers stripped — otherwise `body == payload`.
    */
  case class WarcRecord(
      path: String,
      record_index: Int,
      warc_type: String,
      record_id: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Long,
      http_status: Option[Int],
      http_content_type: Option[String],
      warc_refers_to: String,
      body: Array[Byte]
  )

  /** Read WARC files (plain or gzip, incl. per-record-member gzip) into a
    * DataFrame of [[WarcRecord]] rows. `pattern` is any path/glob the
    * `binaryFile` source accepts — but only the LISTING comes from
    * binaryFile (see the object doc): record bytes stream through a
    * per-file `FileSystem` open, one record in memory at a time. */
  def readWarc(
      spark: SparkSession,
      pattern: String,
      parseHttp: Boolean = true
  ): DataFrame = {
    import spark.implicits._
    val confEntries = hadoopConfEntries(spark)
    val skipped = skippedFiles(spark)
    spark.read
      .format("binaryFile")
      .load(pattern)
      .select("path")
      .as[String]
      .flatMap(path => openAndParse(path, confEntries, parseHttp, skipped))
      .toDF()
  }

  /** [[readWarc]] over an EXPLICIT file listing instead of a glob — the
    * composition point for resumable batch ingest:
    * `Ingest.pendingFiles(...)` → readWarcFor → sink →
    * `Ingest.commitFiles(...)`. Same record schema, streaming shape, and
    * skip accounting as [[readWarc]]. */
  def readWarcFor(
      files: DataFrame,
      pathCol: String = "path",
      parseHttp: Boolean = true
  ): DataFrame = {
    require(files.columns.contains(pathCol), s"column '$pathCol' does not exist")
    val spark = files.sparkSession
    import spark.implicits._
    val confEntries = hadoopConfEntries(spark)
    val skipped = skippedFiles(spark)
    files
      .select(org.apache.spark.sql.functions.col(pathCol).cast("string"))
      .as[String]
      .flatMap(path => openAndParse(path, confEntries, parseHttp, skipped))
      .toDF()
  }

  /** Streaming [[readWarc]]: new `.warc`/`.warc.gz` files landing in `dir`
    * become record rows — crawl ingestion is file-arrival-driven, and the
    * per-file parse is stateless, so the stream composes directly with the
    * streaming dedup/quality gates. Same row schema as the batch reader
    * (`binaryFile` streams require the explicit source schema). */
  def readWarcStream(
      spark: SparkSession,
      dir: String,
      parseHttp: Boolean = true
  ): DataFrame = {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val fileSchema = StructType(
      Seq(
        StructField("path", StringType),
        StructField("modificationTime", TimestampType),
        StructField("length", LongType),
        StructField("content", BinaryType)
      )
    )
    val confEntries = hadoopConfEntries(spark)
    val skipped = skippedFiles(spark)
    // same path-only projection as the batch reader: binaryFile is the
    // file-arrival tracker, never the byte source
    spark.readStream
      .format("binaryFile")
      .schema(fileSchema)
      .load(dir)
      .select("path")
      .as[String]
      .flatMap(path => openAndParse(path, confEntries, parseHttp, skipped))
      .toDF()
  }

  /** The crawl-pipeline entry composition: keep `response` records with an
    * HTTP 200 and a text/html payload, decode the body CHARSET-AWARE
    * ([[decodeHtmlColumn]]: BOM → HTTP `Content-Type` charset → meta-tag
    * sniff → UTF-8, with the WHATWG latin-1→cp1252 alias and a
    * valid-UTF-8 mislabel guard; malformed sequences replaced), and
    * return (url, fetch_time, html) ready for
    * `TextAnalysis.extractHtmlText` → quality → dedup. Real crawls are
    * ~20-30% legacy encodings — an unconditional UTF-8 read mojibakes
    * those pages and silently degrades every downstream signal. */
  def warcResponsesAsHtml(spark: SparkSession, pattern: String): DataFrame = {
    import org.apache.spark.sql.functions._
    readWarc(spark, pattern, parseHttp = true)
      .filter(
        col("warc_type") === "response" &&
          col("http_status") === 200 &&
          col("http_content_type").startsWith("text/html")
      )
      .select(
        col("target_uri").as("url"),
        col("warc_date").cast("timestamp").as("fetch_time"),
        decodeHtmlColumn(col("body"), col("http_content_type")).as("html")
      )
  }

  /** Charset-aware HTML payload decode as a Column — the
    * [[graft.plans.DecodeHtmlExpr]] native expression over (binary body,
    * HTTP Content-Type string; NULL header treated as absent). Per-row
    * codegen, no UDF, no shuffle. */
  def decodeHtmlColumn(
      body: org.apache.spark.sql.Column,
      httpContentType: org.apache.spark.sql.Column
  ): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      graft.plans.DecodeHtmlExpr(
        GraftSqlBridge.expression(body.cast("binary")),
        GraftSqlBridge.expression(coalesce(httpContentType, lit("")))
      )
    )
  }

  /** Read a CDXJ capture index (the `cdx-*.gz` files Common Crawl
    * publishes alongside its WARCs): each line is
    * `<surt-urlkey> <timestamp14> <json-fields>`. Returns one row per
    * capture with the two key columns split out plus the requested JSON
    * fields (by default the ones needed to locate a capture inside a WARC:
    * url, status, mime, digest, filename, offset, length). The idiomatic
    * pre-fetch planning join: filter the index (by `Urls.filterByDomains`
    * on `url`, by status/mime, dedup by digest) BEFORE touching any WARC
    * bytes — the index is ~1000x smaller than the crawl.
    *
    * Scale shape: a plain text scan (gzip files parallelize per file,
    * like the WARCs) + per-row regexp/from_json — no shuffle. Malformed
    * lines yield NULL urlkey/timestamp and NULL fields rather than
    * failing the read. */
  def readCdxj(
      spark: SparkSession,
      pattern: String,
      jsonFields: Map[String, String] = Map(
        "url" -> "STRING",
        "status" -> "STRING",
        "mime" -> "STRING",
        "digest" -> "STRING",
        "filename" -> "STRING",
        "offset" -> "STRING",
        "length" -> "STRING"
      )
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    require(jsonFields.nonEmpty, "jsonFields must not be empty")
    val ddl =
      jsonFields.toSeq.sortBy(_._1).map { case (k, t) => s"`$k` $t" }.mkString(", ")
    val lineRe = "^(\\S+) ([0-9]{14}) (\\{.*\\})$"
    spark.read
      .text(pattern)
      .select(
        nullif(regexp_extract(col("value"), lineRe, 1), lit("")).as("urlkey"),
        nullif(regexp_extract(col("value"), lineRe, 2), lit("")).as("timestamp"),
        from_json(
          nullif(regexp_extract(col("value"), lineRe, 3), lit("")),
          org.apache.spark.sql.types.StructType.fromDDL(ddl)
        ).as("__j")
      )
      .select(col("urlkey") +: col("timestamp") +:
        jsonFields.keys.toSeq.sorted.map(k => col(s"__j.`$k`").as(k)): _*)
  }

  /** Range-fetch WARC records located by a capture index: for each
    * (filename, offset, length) row — the fields [[readCdxj]] surfaces —
    * read EXACTLY that byte range (one gzip member in Common Crawl WARCs,
    * auto-detected; plain ranges also parse) and emit its records. This is
    * the index→gate→fetch composition: filter the ~1000x-smaller CDXJ
    * first, then touch only the gated members, never decompressing whole
    * segments.
    *
    * Scale shape: captures are hash-partitioned by filename and sorted by
    * offset within the partition, so each task opens each of its files
    * ONCE and issues monotonically increasing positioned reads
    * (`FSDataInputStream.readFully(pos, buf)` — readahead-friendly, and
    * the seek pointer is untouched). Memory per task is one member
    * (`length` bytes, capped at [[MaxRecordBytes]]); rows with a
    * non-positive/absurd length or an unreadable range are SKIPPED, not
    * failures — a stale index entry must not kill a 100k-file job.
    *
    * `warcRoot` resolves relative `filename`s (CDXJ carries segment-
    * relative names); absolute filenames pass through. `record_index` is
    * the index WITHIN the fetched range (a CC member holds one record), so
    * join fetched rows back to the index by (path, offset) semantics
    * rather than by record_index. */
  def fetchWarcRecords(
      captures: DataFrame,
      warcRoot: String,
      filenameCol: String = "filename",
      offsetCol: String = "offset",
      lengthCol: String = "length",
      parseHttp: Boolean = true
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = captures.sparkSession
    import spark.implicits._
    Seq(filenameCol, offsetCol, lengthCol).foreach { c =>
      require(captures.columns.contains(c), s"column '$c' does not exist")
    }
    val confEntries = hadoopConfEntries(spark)
    val skipped = skippedCaptures(spark)
    val root = warcRoot
    captures
      .select(
        col(filenameCol).cast("string").as("__f"),
        col(offsetCol).cast("long").as("__o"),
        col(lengthCol).cast("long").as("__l")
      )
      .filter(col("__f").isNotNull && col("__o").isNotNull && col("__l").isNotNull)
      .repartition(col("__f"))
      .sortWithinPartitions("__f", "__o")
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        new Iterator[WarcRecord] {
          private val conf = rebuildConf(confEntries)
          private var curPath: String = null
          private var curIn: org.apache.hadoop.fs.FSDataInputStream = null
          private var recs: Iterator[WarcRecord] = Iterator.empty
          Option(TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => closeCur())
          )
          private def closeCur(): Unit = {
            if (curIn != null) { try curIn.close() catch { case _: Exception => () } }
            curIn = null
          }
          private def fetchNext(): Unit = {
            while (!recs.hasNext && it.hasNext) {
              val (f, off, len) = it.next()
              if (off >= 0 && len > 0 && len <= MaxRecordBytes) {
                val p = resolveWarcPath(root, f)
                val pathStr = p.toString
                try {
                  if (pathStr != curPath) {
                    closeCur()
                    curIn = p.getFileSystem(conf).open(p)
                    curPath = pathStr
                  }
                  val buf = new Array[Byte](len.toInt)
                  curIn.readFully(off, buf)
                  recs = parseBytes(pathStr, buf, parseHttp)
                } catch {
                  // unreadable range / missing segment: skip the capture —
                  // logged and counted (graft.warc.skipped_captures), so a
                  // stale index shows up as a metric, not silent loss
                  case e: java.io.IOException =>
                    warcLog.warn(
                      s"skipping unreadable capture $pathStr@$off+$len: $e")
                    skipped.add(1L)
                    recs = Iterator.empty
                }
              }
            }
            if (!recs.hasNext) closeCur()
          }
          override def hasNext: Boolean = { fetchNext(); recs.hasNext }
          override def next(): WarcRecord = {
            fetchNext()
            if (!recs.hasNext) throw new NoSuchElementException("end of fetch")
            recs.next()
          }
        }
      }
      .toDF()
  }

  /** The production Common Crawl access pattern in ONE call:
    * index → gate → range-fetch. Reads the CDXJ capture index
    * ([[readCdxj]]), gates it by HTTP status, MIME prefix, and
    * allow/block domain lists ([[graft.operators.Urls.filterByDomains]]
    * on the capture `url` — all before touching a WARC byte; the index
    * is ~1000x smaller than the crawl), optionally keeps one capture per
    * content digest (the CC revisit-dedup: identical payloads fetched
    * once), then [[fetchWarcRecords]] range-reads only the surviving
    * members. Returns [[WarcRecord]] rows.
    *
    * Scale shape: the gate is per-row index compute (no shuffle beyond
    * the digest dedup's aggregate, which ships only digest + location
    * columns); fetches are file-partitioned with offset-ordered
    * positioned reads. The whole-segment decompression a naive
    * readWarc-then-filter would pay never happens. */
  def cdxjGatedFetch(
      spark: SparkSession,
      cdxjPattern: String,
      warcRoot: String,
      statuses: Seq[String] = Seq("200"),
      mimePrefixes: Seq[String] = Seq("text/html"),
      allowDomains: Seq[String] = Nil,
      blockDomains: Seq[String] = Nil,
      dedupByDigest: Boolean = true,
      parseHttp: Boolean = true
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    var idx = readCdxj(spark, cdxjPattern)
    if (statuses.nonEmpty) idx = idx.filter(col("status").isin(statuses: _*))
    if (mimePrefixes.nonEmpty)
      idx = idx.filter(
        mimePrefixes.map(p => col("mime").startsWith(p)).reduce(_ || _)
      )
    if (allowDomains.nonEmpty || blockDomains.nonEmpty)
      idx = graft.operators.Urls
        .filterByDomains(idx, "url", block = blockDomains, allow = allowDomains)
        .filter(col("url").isNotNull)
    if (dedupByDigest) {
      // one fetch per payload digest: deterministic first capture by
      // (filename, offset) — a skinny aggregate over location columns
      idx = idx
        .filter(col("digest").isNotNull)
        .groupBy("digest")
        .agg(
          min(struct(col("filename"), col("offset").cast("long").as("offset")))
            .as("__loc")
        )
        .select(col("__loc.filename").as("filename"), col("__loc.offset").as("offset"))
        .join(
          idx.select(
            col("filename"),
            col("offset").cast("long").as("offset"),
            col("length")
          ),
          Seq("filename", "offset")
        )
        .dropDuplicates("filename", "offset")
    }
    fetchWarcRecords(idx, warcRoot, parseHttp = parseHttp)
  }

  /** One-range convenience over [[fetchWarcRecords]]: the records inside
    * the `length` bytes at `offset` of `path` — e.g. a single CDXJ capture
    * member. Same row schema as [[readWarc]]. */
  def readWarcRecords(
      spark: SparkSession,
      path: String,
      offset: Long,
      length: Long,
      parseHttp: Boolean = true
  ): DataFrame = {
    import spark.implicits._
    require(offset >= 0, "offset must be >= 0")
    require(length > 0, "length must be > 0")
    val captures = Seq((path, offset, length)).toDF("filename", "offset", "length")
    fetchWarcRecords(captures, warcRoot = "", parseHttp = parseHttp)
  }

  /** Write documents back out as WARC (per-record-member gzip, the
    * Common Crawl convention — each record its own gzip member, so the
    * resulting files range-fetch with [[fetchWarcRecords]] and
    * concatenate freely): one `part-NNNNN.warc.gz` per partition, rows
    * become `resource` records (URI + date + content type + body). This
    * is the interchange sink for curated subsets — after gating/dedup,
    * re-shard the survivors into the same container format the crawl
    * arrived in.
    *
    * Required columns: `uriCol` (string), `bodyCol` (binary); optional
    * `dateCol` (string, ISO-8601 — a constant epoch stamp when absent,
    * so output is deterministic) and `contentTypeCol`. Record ids are
    * deterministic md5-derived urn:uuid values (re-running the write
    * yields byte-identical records given the same partitioning).
    *
    * Scale shape: one streaming pass per partition through a Hadoop
    * `FileSystem` output stream — one record in memory at a time; size
    * output files by partitioning the input (`repartition(n)` for ~even
    * shards). EAGER (the write happens before this returns, like every
    * sink); returns the manifest (path, n_records, bytes) — one
    * file-sized row per written file.
    *
    * `withCdxj` (default true) also writes a sibling `part-NNNNN.cdxj`
    * capture index per shard — one line per record with the SURT urlkey
    * ([[graft.operators.Urls.surtKey]] semantics), a 14-digit timestamp
    * from the record date, and the (filename, offset, length) of the
    * record's gzip member plus url/status ("200" — curated content, so
    * the default status gate passes)/mime/digest (md5 hex of the body) —
    * so the output supports the full index→gate→fetch pattern
    * ([[readCdxj]] → [[cdxjGatedFetch]] / [[fetchWarcRecords]]) without
    * ever scanning a segment. Member offsets come from the output
    * stream position around each gzip member, so the index is exact by
    * construction (asserted by the round-trip suite). */
  def writeWarc(
      df: DataFrame,
      dir: String,
      uriCol: String = "url",
      bodyCol: String = "body",
      dateCol: Option[String] = None,
      contentTypeCol: Option[String] = None,
      withCdxj: Boolean = true
  ): DataFrame =
    writeRecords(df, dir, uriCol, bodyCol, dateCol, contentTypeCol,
      refersToCol = None, recordType = "resource", withCdxj = withCdxj)

  /** WET-style extracted-text interchange sink: like [[writeWarc]] but
    * rows become `conversion` records (the Common Crawl WET convention
    * for text EXTRACTED from a capture, rather than original `resource`
    * payloads), bodies are the UTF-8 encoding of `textCol`, the content
    * type is `text/plain`, and `refersToCol` (when given) becomes each
    * record's `WARC-Refers-To` header — the back-pointer to the source
    * capture's record id that lets external WET consumers join extracted
    * text to its crawl record. Same per-record-gzip-member layout, CDXJ
    * sibling index, determinism, and scale shape as [[writeWarc]];
    * [[readWet]] (or any WET-aware tool) reads the output back. */
  def writeWet(
      df: DataFrame,
      dir: String,
      uriCol: String = "url",
      textCol: String = "text",
      dateCol: Option[String] = None,
      refersToCol: Option[String] = None,
      withCdxj: Boolean = true
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    require(df.columns.contains(textCol), s"column '$textCol' does not exist")
    val withBody = df.withColumn("__wet_body", encode(col(textCol), "UTF-8"))
      .withColumn("__wet_ct", lit("text/plain"))
    writeRecords(withBody, dir, uriCol, "__wet_body", dateCol,
      Some("__wet_ct"), refersToCol, recordType = "conversion",
      withCdxj = withCdxj)
  }

  /** Read WET-style extracted-text files back: `conversion` records from
    * any WARC-container input (our [[writeWet]] output or external WET
    * shards), with the body decoded as UTF-8 text. Returns
    * (url, fetch_time, refers_to, text) — `refers_to` is the source
    * capture's record id ("" when the producer emitted none). Same
    * file-at-a-time streaming scale shape as [[readWarc]]. */
  def readWet(spark: SparkSession, pattern: String): DataFrame = {
    import org.apache.spark.sql.functions._
    readWarc(spark, pattern, parseHttp = false)
      .filter(col("warc_type") === "conversion")
      .select(
        col("target_uri").as("url"),
        col("warc_date").cast("timestamp").as("fetch_time"),
        col("warc_refers_to").as("refers_to"),
        decode(col("body"), "UTF-8").as("text")
      )
  }

  private def writeRecords(
      df: DataFrame,
      dir: String,
      uriCol: String,
      bodyCol: String,
      dateCol: Option[String],
      contentTypeCol: Option[String],
      refersToCol: Option[String],
      recordType: String,
      withCdxj: Boolean
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    import spark.implicits._
    (Seq(uriCol, bodyCol) ++ refersToCol).foreach { c =>
      require(df.columns.contains(c), s"column '$c' does not exist")
    }
    val confEntries = hadoopConfEntries(spark)
    val rows = df.select(
      col(uriCol).cast("string").as("__u"),
      col(bodyCol).cast("binary").as("__b"),
      dateCol
        .map(c => col(c).cast("string"))
        .getOrElse(lit("1970-01-01T00:00:00Z"))
        .as("__d"),
      contentTypeCol
        .map(c => col(c).cast("string"))
        .getOrElse(lit("application/octet-stream"))
        .as("__ct"),
      refersToCol
        .map(c => col(c).cast("string"))
        .getOrElse(lit(null).cast("string"))
        .as("__ref")
    )
    rows
      .as[(String, Array[Byte], String, String, String)]
      .mapPartitions { it =>
        val pid = Option(TaskContext.get()).map(_.partitionId()).getOrElse(0)
        if (!it.hasNext) Iterator.empty
        else {
          val conf = rebuildConf(confEntries)
          val warcName = f"part-$pid%05d.warc.gz"
          val p = new org.apache.hadoop.fs.Path(dir, warcName)
          val fs = p.getFileSystem(conf)
          val out = fs.create(p, true)
          val idx: java.io.Writer =
            if (withCdxj)
              new java.io.OutputStreamWriter(
                fs.create(
                  new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.cdxj"),
                  true),
                "UTF-8")
            else null
          var n = 0L
          try {
            it.foreach { case (uri, body, date, ct, ref) =>
              val b = if (body == null) Array.emptyByteArray else body
              val digest = java.security.MessageDigest
                .getInstance("MD5")
                .digest((s"$uri|$n|$pid").getBytes("UTF-8"))
              val id = digest.map(x => f"${x & 0xff}%02x").mkString
              val refersTo = Option(ref).filter(_.nonEmpty).map { r =>
                val v = if (r.startsWith("<")) r else s"<$r>"
                "WARC-Refers-To" -> v
              }
              val head =
                ("WARC/1.0" +:
                  (Seq(
                    "WARC-Type" -> recordType,
                    "WARC-Record-ID" -> s"<urn:uuid:$id>",
                    "WARC-Target-URI" -> Option(uri).getOrElse(""),
                    "WARC-Date" -> Option(date).getOrElse("")
                  ) ++ refersTo ++ Seq(
                    "Content-Type" -> Option(ct).getOrElse(""),
                    "Content-Length" -> b.length.toString
                  )).map { case (k, v) => s"$k: $v" })
                  .mkString("\r\n") + "\r\n\r\n"
              // one gzip member per record: open/finish a deflater per row
              val memberStart = out.getPos
              val gz = new java.util.zip.GZIPOutputStream(
                new NonClosingOutputStream(out), 1 << 16)
              gz.write(head.getBytes("ISO-8859-1"))
              gz.write(b)
              gz.write("\r\n\r\n".getBytes("ISO-8859-1"))
              gz.finish()
              if (idx != null) {
                val memberLen = out.getPos - memberStart
                val urlkey = graft.operators.Urls
                  .surtKeyScala(uri)
                  .getOrElse("-")
                val ts = Option(date)
                  .getOrElse("")
                  .filter(_.isDigit)
                  .take(14)
                  .padTo(14, '0')
                val bodyMd5 = java.security.MessageDigest
                  .getInstance("MD5")
                  .digest(b)
                  .map(x => f"${x & 0xff}%02x")
                  .mkString
                def j(s: String): String =
                  s.replace("\\", "\\\\").replace("\"", "\\\"")
                // status "200": written records represent successfully
                // curated content, and emitting the field keeps
                // cdxjGatedFetch's DEFAULT status gate (statuses=["200"])
                // working over self-written indexes — a status-less line
                // would make the advertised index→gate→fetch round trip
                // silently return zero rows with default arguments
                idx.write(
                  s"""$urlkey $ts {"url": "${j(Option(uri).getOrElse(""))}", """ +
                    s""""status": "200", """ +
                    s""""mime": "${j(Option(ct).getOrElse(""))}", """ +
                    s""""digest": "$bodyMd5", "filename": "$warcName", """ +
                    s""""offset": "$memberStart", "length": "$memberLen"}""" + "\n")
              }
              n += 1
            }
          } finally {
            // close each stream independently: a failing out.close() must
            // not leak the index writer (or leave a truncated .cdxj beside
            // a complete .warc.gz)
            try out.close()
            finally if (idx != null) idx.close()
          }
          val len = fs.getFileStatus(p).getLen
          Iterator.single((p.toString, n, len))
        }
      }
      .collect() // EAGER: one row per file — model-sized by construction
      .toSeq
      .toDF("path", "n_records", "bytes")
  }

  /** Wrapper that swallows close() so per-record GZIPOutputStream members
    * can finish() without closing the shared file stream. */
  private class NonClosingOutputStream(out: java.io.OutputStream)
      extends java.io.FilterOutputStream(out) {
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      out.write(b, off, len)
    override def close(): Unit = flush()
  }

  /** Resolve a capture `filename` against the WARC root; absolute paths
    * and full URIs pass through. */
  private def resolveWarcPath(
      root: String,
      filename: String
  ): org.apache.hadoop.fs.Path = {
    val p = new org.apache.hadoop.fs.Path(filename)
    if (root.isEmpty || p.isAbsolute || filename.contains("://")) p
    else new org.apache.hadoop.fs.Path(root, filename)
  }

  /** Effective Hadoop conf as plain serializable entries — rebuilt on the
    * executor by [[rebuildConf]]. Carries cluster fs settings (s3a creds,
    * endpoints) without touching any Spark-private serialization helper. */
  private[graft] def hadoopConfEntries(spark: SparkSession): Array[(String, String)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val it = conf.iterator()
    val b = Array.newBuilder[(String, String)]
    while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
    b.result()
  }

  private def rebuildConf(
      entries: Array[(String, String)]
  ): org.apache.hadoop.conf.Configuration = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    entries.foreach { case (k, v) => conf.set(k, v) }
    conf
  }

  /** Open one WARC file as a record-streaming iterator: Hadoop
    * `FileSystem` stream, 64 KB buffer, gzip auto-detected from the magic
    * bytes. The stream closes at iterator end and on task completion; an
    * unreadable file yields zero records (one rotten segment in a
    * 100k-file job is data loss, not a stage failure) — but never a
    * SILENT zero: the skip is logged with the path and counted in the
    * session's `graft.warc.skipped_files` accumulator
    * ([[skippedFiles]]), and a transient (non-FileNotFound) open failure
    * is retried once first, since an S3 throttle or HDFS hiccup is
    * recoverable where a deleted file is not. */
  private[graft] def openAndParse(
      pathStr: String,
      confEntries: Array[(String, String)],
      parseHttp: Boolean,
      skipped: org.apache.spark.util.LongAccumulator = null
  ): Iterator[WarcRecord] = {
    def attempt(): Iterator[WarcRecord] = {
      val p = new org.apache.hadoop.fs.Path(pathStr)
      var raw: InputStream = null
      try {
        raw = p.getFileSystem(rebuildConf(confEntries)).open(p)
        val pb = new PushbackInputStream(new BufferedInputStream(raw, 1 << 16), 2)
        val b1 = pb.read(); val b2 = pb.read()
        if (b2 >= 0) pb.unread(b2)
        if (b1 >= 0) pb.unread(b1)
        // the close target is the OUTERMOST stream, so the gzip path ends
        // its Inflater's native buffers promptly at iterator end instead
        // of leaving them to the finalizer (a task walking thousands of
        // gzip files would otherwise accumulate un-end()ed inflaters)
        val in: InputStream =
          if (b1 == 0x1f && b2 == 0x8b)
            new BufferedInputStream(new GZIPInputStream(pb))
          else pb
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try in.close() catch { case _: Exception => () })
        )
        closeAtEnd(parseStream(pathStr, in, parseHttp), in)
      } catch {
        case e: java.io.IOException =>
          if (raw != null) { try raw.close() catch { case _: Exception => () } }
          throw e
      }
    }
    try attempt()
    catch {
      case e: java.io.FileNotFoundException =>
        warcLog.warn(s"skipping missing WARC file $pathStr: $e")
        if (skipped != null) skipped.add(1L)
        Iterator.empty
      case _: java.io.IOException =>
        // transient IO (throttle, hiccup): one retry before giving up.
        // Back off briefly first — the motivating failures (object-store
        // throttle, HDFS hiccup) persist for tens to hundreds of ms, so a
        // back-to-back reopen mostly re-hits the same condition. The delay
        // is deterministic per path (no Random; tasks retrying the same
        // file back off identically) and spread across 100-500ms so a
        // whole stage hitting one throttled prefix doesn't retry in sync.
        Thread.sleep(100L + (pathStr.hashCode & 0x7fffffff) % 400L)
        try attempt()
        catch {
          case e2: java.io.IOException =>
            warcLog.warn(s"skipping unreadable WARC file $pathStr (after retry): $e2")
            if (skipped != null) skipped.add(1L)
            Iterator.empty
        }
    }
  }

  /** Close `resource` the moment the iterator is exhausted (the task-
    * completion listener is the backstop for early termination). */
  private def closeAtEnd(
      it: Iterator[WarcRecord],
      resource: java.io.Closeable
  ): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private var closed = false
    override def hasNext: Boolean = {
      val h = it.hasNext
      if (!h && !closed) {
        closed = true
        try resource.close() catch { case _: Exception => () }
      }
      h
    }
    override def next(): WarcRecord = it.next()
  }

  /** Parse one file's bytes (auto-detecting gzip) into a record iterator.
    * Exposed for tests and for callers holding bytes from elsewhere. */
  private[graft] def parseBytes(
      path: String,
      bytes: Array[Byte],
      parseHttp: Boolean
  ): Iterator[WarcRecord] = {
    val raw = new ByteArrayInputStream(bytes)
    val in: InputStream =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        new BufferedInputStream(new GZIPInputStream(raw))
      else new BufferedInputStream(raw)
    parseStream(path, in, parseHttp)
  }

  private def parseStream(
      path: String,
      in: InputStream,
      parseHttp: Boolean
  ): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private var nextRec: WarcRecord = _
    private var done = false
    private var idx = 0

    private def advance(): Unit = {
      nextRec = null
      if (done) return
      try advanceUnsafe()
      catch {
        // a corrupt member (bad gzip trailer, truncated stream) abandons
        // THIS file's remainder — at 100k files per job, one rotten
        // segment must not fail the stage; logged so the loss is visible
        case e: java.io.IOException =>
          warcLog.warn(s"abandoning WARC remainder of $path after record $idx: $e")
          done = true
      }
    }

    private def advanceUnsafe(): Unit = {
      // scan to the next WARC/ version line (skips inter-record blank
      // lines and any leading garbage)
      var line = readLine(in)
      while (line != null && !line.startsWith("WARC/")) line = readLine(in)
      if (line == null) { done = true; return }

      val headers = readHeaders(in)
      val lenOpt = headers
        .get("content-length")
        .flatMap(_.toLongOption)
        // an absurd length is corruption, not data: re-syncing past it is
        // impossible and allocating it is an OOM — abandon the file
        .filter(l => l >= 0 && l <= MaxRecordBytes)
      lenOpt match {
        case None =>
          // cannot re-sync without a trustworthy length
          done = true
        case Some(len) =>
          val payload = readFully(in, len)
          if (payload.length < len) { done = true; return }
          val contentType = headers.getOrElse("content-type", "")
          val isHttp =
            parseHttp && contentType.toLowerCase.startsWith("application/http")
          val (status, httpCt, body) =
            if (isHttp) splitHttp(payload) else (None, None, payload)
          nextRec = WarcRecord(
            path = path,
            record_index = idx,
            warc_type = headers.getOrElse("warc-type", ""),
            record_id = stripAngles(headers.getOrElse("warc-record-id", "")),
            target_uri = stripAngles(headers.getOrElse("warc-target-uri", "")),
            warc_date = headers.getOrElse("warc-date", ""),
            content_type = contentType,
            content_length = len,
            http_status = status,
            http_content_type = httpCt,
            warc_refers_to = stripAngles(headers.getOrElse("warc-refers-to", "")),
            body = body
          )
          idx += 1
      }
    }

    advance()
    override def hasNext: Boolean = nextRec != null
    override def next(): WarcRecord = {
      if (nextRec == null) throw new NoSuchElementException("end of WARC")
      val r = nextRec
      advance()
      r
    }
  }

  /** One header block: `Name: value` lines until the blank line, names
    * lowercased, continuation lines (leading SP/HT) folded into the
    * previous value. */
  private def readHeaders(in: InputStream): Map[String, String] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var last: String = null
    var line = readLine(in)
    while (line != null && line.nonEmpty) {
      if ((line.head == ' ' || line.head == '\t') && last != null)
        m(last) = m(last) + " " + line.trim
      else {
        val i = line.indexOf(':')
        if (i > 0) {
          last = line.substring(0, i).trim.toLowerCase
          m(last) = line.substring(i + 1).trim
        }
      }
      line = readLine(in)
    }
    m.toMap
  }

  /** Split an `application/http` payload into (status, content-type,
    * body-after-headers). Payloads without a header/body separator come
    * back whole with no status — truncated fetches are data, not errors. */
  private def splitHttp(
      payload: Array[Byte]
  ): (Option[Int], Option[String], Array[Byte]) = {
    val sep = indexOfDoubleCrlf(payload)
    if (sep < 0) (None, None, payload)
    else {
      val head = new String(payload, 0, sep, "ISO-8859-1")
      val lines = head.split("\r\n")
      val status = lines.headOption
        .filter(_.startsWith("HTTP/"))
        .flatMap(_.split(" ", 3).lift(1))
        .flatMap(_.toIntOption)
      val ct = lines.iterator
        .drop(1)
        .map(_.split(":", 2))
        .collectFirst {
          case Array(k, v) if k.trim.equalsIgnoreCase("content-type") =>
            v.trim
        }
      (status, ct, payload.drop(sep + 4))
    }
  }

  private def indexOfDoubleCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  private def stripAngles(s: String): String =
    if (s.length >= 2 && s.head == '<' && s.last == '>')
      s.substring(1, s.length - 1)
    else s

  /** Read one CRLF/LF-terminated line as ISO-8859-1 (header sections are
    * ASCII by spec); null at EOF with nothing read. */
  private def readLine(in: InputStream): String = {
    val sb = new java.lang.StringBuilder(64)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    sb.toString
  }

  /** Per-record payload cap — far above any real WARC record (CC caps
    * fetches around 1 MB; 1 GiB leaves room for outliers) and far below
    * an executor-killing allocation from a corrupt Content-Length. */
  private val MaxRecordBytes: Long = 1L << 30

  private def readFully(in: InputStream, len: Long): Array[Byte] = {
    val out = new Array[Byte](len.toInt)
    var off = 0
    try {
      while (off < out.length) {
        val n = in.read(out, off, out.length - off)
        if (n < 0) return java.util.Arrays.copyOf(out, off)
        off += n
      }
      out
    } catch {
      case _: EOFException => java.util.Arrays.copyOf(out, off)
    }
  }
}
