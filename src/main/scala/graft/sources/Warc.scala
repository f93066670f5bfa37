package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

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
  * splits than executors). Each task parses its files as a STREAM: records
  * are decoded one at a time through a bounded iterator, so task memory
  * holds one record body, not one file, beyond the `binaryFile` source's
  * own per-file buffer. No shuffle — rows flow straight into downstream
  * per-row operators.
  *
  * Parsing is deliberately tolerant: leading garbage before the next
  * `WARC/` magic is skipped, a record with a missing/invalid
  * `Content-Length` aborts only its FILE's remainder (the stream cannot be
  * re-synced without it), and header continuation lines are folded per the
  * spec. Header names are case-insensitive.
  */
object Warc {

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
      body: Array[Byte]
  )

  /** Read WARC files (plain or gzip, incl. per-record-member gzip) into a
    * DataFrame of [[WarcRecord]] rows. `pattern` is any path/glob the
    * `binaryFile` source accepts. */
  def readWarc(
      spark: SparkSession,
      pattern: String,
      parseHttp: Boolean = true
  ): DataFrame = {
    import spark.implicits._
    spark.read
      .format("binaryFile")
      .load(pattern)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => parseBytes(path, bytes, parseHttp) }
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
    spark.readStream
      .format("binaryFile")
      .schema(fileSchema)
      .load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => parseBytes(path, bytes, parseHttp) }
      .toDF()
  }

  /** The crawl-pipeline entry composition: keep `response` records with an
    * HTTP 200 and a text/html payload, decode the body as UTF-8
    * (malformed sequences replaced, per the usual crawl practice), and
    * return (url, fetch_time, html) ready for
    * `TextAnalysis.extractHtmlText` → quality → dedup. */
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
        decode(col("body"), "UTF-8").as("html")
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
        // segment must not fail the stage
        case _: java.io.IOException => done = true
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
