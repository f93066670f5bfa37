package graft.plans

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Charset-aware HTML payload decoding and mojibake repair.
  *
  * Real crawls are ~20-30% legacy encodings (windows-1252, GBK, Shift_JIS,
  * EUC-KR, …); decoding every body as UTF-8-with-replacement mojibakes
  * those pages, and every downstream operator (langId, quality scoring,
  * dedup shingles) then degrades silently for the wrong reason. These are
  * custom Catalyst expressions (extension tier (b): built-ins can't express
  * it — Spark's `decode` rejects non-Unicode charsets without a legacy flag
  * and ERRORS on malformed bytes, where crawl practice is replace-and-move-
  * on) with tight static-helper codegen, so the hot path stays inside
  * whole-stage codegen like the rest of the crawl tier.
  *
  * Charset resolution follows browser/WHATWG practice (documented subset):
  *   1. a byte-order mark is authoritative (UTF-8 / UTF-32LE / UTF-32BE /
  *      UTF-16LE / UTF-16BE — the 4-byte UTF-32 marks checked before the
  *      2-byte UTF-16 ones they contain; stripped from the output);
  *   2. the `charset` parameter of the HTTP `Content-Type` header;
  *   3. a `<meta charset=…>` / `http-equiv Content-Type` sniff over the
  *      first 2048 bytes;
  *   4. UTF-8.
  * Declared `ISO-8859-1` / `US-ASCII` / `latin1` map to windows-1252 (the
  * WHATWG alias rule — real pages labeled latin-1 use the cp1252
  * 0x80-0x9F range). Unknown/unsupported names fall through to the next
  * tier. One mislabel guard: when the resolved charset is single-byte but
  * the body is strictly valid UTF-8 with at least one non-ASCII byte, the
  * body IS UTF-8 (a single-byte read of it would be mojibake) and is
  * decoded as such. All decodes replace malformed/unmappable sequences.
  */
object EncodingUtils {

  /** WHATWG-style aliases that mean windows-1252 on the real web. */
  private val Cp1252Aliases: java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    Seq(
      "iso-8859-1", "iso8859-1", "iso_8859-1", "iso88591", "8859-1",
      "latin1", "latin-1", "l1", "cp819", "ibm819",
      "us-ascii", "ascii", "ansi_x3.4-1968",
      "windows-1252", "cp1252", "x-cp1252"
    ).foreach(s.add)
    s
  }

  private val HeaderCharsetRe = java.util.regex.Pattern.compile(
    "(?i)charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9._:+-]+)")

  // covers <meta charset="…"> AND <meta http-equiv=Content-Type
  // content="text/html; charset=…"> — both reduce to a charset= attribute
  // inside a meta tag
  private val MetaCharsetRe = java.util.regex.Pattern.compile(
    "(?i)<meta[^>]{0,512}?charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9._:+-]+)")

  private def lookupCharset(name: String): Charset = {
    if (name == null) return null
    val n = name.trim.toLowerCase
    if (n.isEmpty) return null
    if (Cp1252Aliases.contains(n)) return Charset.forName("windows-1252")
    try { if (Charset.isSupported(n)) Charset.forName(n) else null }
    catch { case _: Exception => null }
  }

  /** Charset from an HTTP Content-Type header value, null when absent or
    * unsupported. */
  private[graft] def charsetFromContentType(ct: String): Charset = {
    if (ct == null) return null
    val m = HeaderCharsetRe.matcher(ct)
    if (m.find()) lookupCharset(m.group(1)) else null
  }

  /** Charset from a meta tag in the first 2048 bytes (sniffed through a
    * latin-1 view — charset names are ASCII), null when absent. */
  private[graft] def metaCharset(body: Array[Byte], off: Int): Charset = {
    val n = math.min(body.length - off, 2048)
    if (n <= 0) return null
    val head = new String(body, off, n, StandardCharsets.ISO_8859_1)
    val m = MetaCharsetRe.matcher(head)
    if (m.find()) lookupCharset(m.group(1)) else null
  }

  private def isSingleByte(cs: Charset): Boolean =
    try cs.canEncode && cs.newEncoder().maxBytesPerChar() == 1.0f
    catch { case _: Exception => false }

  private def hasNonAscii(b: Array[Byte], off: Int): Boolean = {
    var i = off
    while (i < b.length) {
      if ((b(i) & 0x80) != 0) return true
      i += 1
    }
    false
  }

  /** Strict UTF-8 decode; null when any sequence is malformed. */
  private def strictUtf8(b: Array[Byte], off: Int): String = {
    val dec = StandardCharsets.UTF_8
      .newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(b, off, b.length - off)).toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  private def replaceDecode(b: Array[Byte], off: Int, cs: Charset): String = {
    val dec = cs
      .newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    try dec.decode(java.nio.ByteBuffer.wrap(b, off, b.length - off)).toString
    catch {
      // a pathological decoder failure must degrade to the old behavior,
      // never fail the row
      case _: Exception =>
        new String(b, off, b.length - off, StandardCharsets.UTF_8)
    }
  }

  /** The [[DecodeHtmlExpr]] kernel — see the object doc for the
    * resolution order. `headerCt` is the HTTP Content-Type value ("" when
    * absent). */
  def decodeHtml(body: Array[Byte], headerCt: UTF8String): UTF8String = {
    if (body == null) return null
    var off = 0
    var cs: Charset = null
    if (body.length >= 3 && (body(0) & 0xff) == 0xEF &&
        (body(1) & 0xff) == 0xBB && (body(2) & 0xff) == 0xBF) {
      cs = StandardCharsets.UTF_8; off = 3
    } else if (body.length >= 4 && (body(0) & 0xff) == 0xFF &&
        (body(1) & 0xff) == 0xFE && body(2) == 0 && body(3) == 0) {
      // the 4-byte UTF-32 BOMs MUST be ruled out before the 2-byte UTF-16
      // ones: FF FE 00 00 starts with the UTF-16LE mark, and a UTF-16LE
      // read of a UTF-32LE body is NUL-interleaved mojibake
      cs = Charset.forName("UTF-32LE"); off = 4
    } else if (body.length >= 4 && body(0) == 0 && body(1) == 0 &&
        (body(2) & 0xff) == 0xFE && (body(3) & 0xff) == 0xFF) {
      cs = Charset.forName("UTF-32BE"); off = 4
    } else if (body.length >= 2 && (body(0) & 0xff) == 0xFF &&
        (body(1) & 0xff) == 0xFE) {
      cs = StandardCharsets.UTF_16LE; off = 2
    } else if (body.length >= 2 && (body(0) & 0xff) == 0xFE &&
        (body(1) & 0xff) == 0xFF) {
      cs = StandardCharsets.UTF_16BE; off = 2
    }
    if (cs == null && headerCt != null)
      cs = charsetFromContentType(headerCt.toString)
    if (cs == null) cs = metaCharset(body, off)
    if (cs == null) cs = StandardCharsets.UTF_8
    // mislabel guard: a strictly-valid-UTF-8 body with non-ASCII bytes
    // declared as a single-byte charset IS UTF-8 (the single-byte read
    // would be the mojibake)
    if (!(cs eq StandardCharsets.UTF_8) && isSingleByte(cs) &&
        hasNonAscii(body, off)) {
      val asUtf8 = strictUtf8(body, off)
      if (asUtf8 != null) return UTF8String.fromString(asUtf8)
    }
    UTF8String.fromString(replaceDecode(body, off, cs))
  }

  // ===== mojibake repair (ftfy-lite) =====

  /** windows-1252 byte→char table (identical to latin-1 outside
    * 0x80-0x9F; Java maps the five undefined cp1252 positions to the C1
    * controls, completing the bijection) and its inverse. */
  private val Cp1252Chars: Array[Char] = {
    val cs = Charset.forName("windows-1252")
    val out = new Array[Char](256)
    var b = 0
    while (b < 256) {
      out(b) = new String(Array(b.toByte), cs).charAt(0)
      b += 1
    }
    out
  }

  private val Cp1252Inverse: java.util.HashMap[Character, java.lang.Byte] = {
    val m = new java.util.HashMap[Character, java.lang.Byte]()
    var b = 0
    while (b < 256) {
      m.put(Cp1252Chars(b), b.toByte)
      b += 1
    }
    m
  }

  /** Chars that a UTF-8 CONTINUATION byte (0x80-0xBF) becomes under a
    * windows-1252 OR latin-1 misread: U+0080-U+00BF themselves plus the
    * cp1252 images of 0x80-0x9F (€ ‚ ƒ „ … † ‡ ˆ ‰ Š ‹ Œ Ž ' ' " " • – —
    * ˜ ™ š › œ ž Ÿ). */
  private def isContinuationChar(c: Char): Boolean =
    (c >= 0x80 && c <= 0xBF) || {
      val b = Cp1252Inverse.get(Character.valueOf(c))
      b != null && (b.byteValue() & 0xff) >= 0x80 && (b.byteValue() & 0xff) <= 0xBF
    }

  /** The double-encoding signature: a char that is a UTF-8 LEAD byte
    * misread (U+00C2-U+00F4 — 2- to 4-byte leads) immediately followed by
    * a continuation-class char. Genuine Western text (é, ü standing
    * alone) never forms the pair; mojibake always does. */
  private[graft] def hasMojibakePair(s: String): Boolean = {
    var i = 0
    val n = s.length - 1
    while (i < n) {
      val c = s.charAt(i)
      if (c >= 0xC2 && c <= 0xF4 && isContinuationChar(s.charAt(i + 1)))
        return true
      i += 1
    }
    false
  }

  /** Map a mojibake string back to the bytes it was decoded from: the
    * cp1252 inverse where defined, the low byte for other chars ≤ 0xFF
    * (the latin-1-misread case), null when ANY char is unmappable —
    * a string that can't round-trip to single bytes was never a
    * single-byte misread, so repair must not touch it. */
  private def inverseSingleByte(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val b = Cp1252Inverse.get(Character.valueOf(c))
      if (b != null) out(i) = b.byteValue()
      else if (c <= 0xFF) out(i) = c.toByte
      else return null
      i += 1
    }
    out
  }

  /** The CJK double-encoding inverse charsets. Resolved lazily so a JVM
    * without the extended-charsets module degrades to latin-only repair
    * instead of failing class init. */
  private lazy val GbkCharset: Charset =
    try Charset.forName("GBK")
    catch { case _: Exception => null }
  private lazy val SjisCharset: Charset =
    try Charset.forName("Shift_JIS")
    catch { case _: Exception => null }

  /** Cheap pre-gate for the CJK repair attempt: UTF-8-read-as-GBK /
    * Shift_JIS mojibake is dominated by CJK ideographs plus kana /
    * half-width forms ("涓枃", "繧偵リ"), so a string with none of those
    * was never a CJK misread. */
  private def hasCjkChar(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 0x2E80 && c <= 0x9FFF) ||
        (c >= 0xF900 && c <= 0xFAFF) ||
        (c >= 0xFF00 && c <= 0xFFEF)) return true
      i += 1
    }
    false
  }

  /** Strict whole-string encode in `cs`; null when ANY char is
    * unmappable — the abort-on-unmappable discipline of
    * [[inverseSingleByte]] applied to a multi-byte charset. */
  private def inverseBytes(s: String, cs: Charset): Array[Byte] = {
    if (cs == null) return null
    val enc = cs
      .newEncoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try {
      val bb = enc.encode(java.nio.CharBuffer.wrap(s))
      val out = new Array[Byte](bb.remaining())
      bb.get(out)
      out
    } catch { case _: Exception => null }
  }

  /** One CJK-family repair attempt: inverse-encode the WHOLE string in
    * `cs`, accept only a strictly-valid-UTF-8 decode that SHRINKS the
    * string. The shrink guard is load-bearing: a genuine CJK string
    * whose 2-bytes-per-char encoding happens to align to 2-byte UTF-8
    * sequences would round-trip length-preserving (e.g. "为十" → GBK
    * CE AA CA AE → "Ϊʮ"), while a true UTF-8 misread always shrinks
    * (3 bytes of a CJK char became ≥ 1.5 chars). */
  private def tryCjkInverse(s: String, cs: Charset): String = {
    val bytes = inverseBytes(s, cs)
    if (bytes == null) return null
    val dec = strictUtf8(bytes, 0)
    if (dec != null && dec != s && dec.length < s.length) dec else null
  }

  /** The [[FixEncodingExpr]] kernel: detect-and-undo double encoding —
    * UTF-8 read as windows-1252/latin-1 ("Ã©" → "é", "â€™" → "'"), and
    * the CJK misread families, UTF-8 read as GBK ("涓枃" → "中文") or as
    * Shift_JIS ("譌･譛ｬ" → "日本"). Per family, same strict discipline:
    * a cheap signature gate (lead+continuation pair for the single-byte
    * family; presence of CJK/kana/width-forms chars AND ≥ 8 chars of
    * evidence for the CJK ones — below that, a coincidental alignment
    * is not distinguishable from a misread), whole-string inverse that
    * ABORTS if any char is unmappable, and strict-UTF-8 validation of
    * the inverse bytes — random legacy text virtually never passes, so
    * clean text (genuine "café" or "中文", which fail pair-gate or
    * validation) is untouched. The single-byte family is tried first;
    * GBK before Shift_JIS (the validation step disambiguates — a
    * both-valid collision is astronomically rare and the order makes it
    * deterministic). Honest limit: Shift_JIS's NEC/IBM dual code points
    * re-encode to the canonical alternative, so a misread through the
    * non-canonical zone repairs to equivalent-but-different bytes. Runs
    * to a fixed point (≤ 4 rounds) so doubly-double-encoded text
    * repairs fully and the operator is idempotent. */
  def fixEncoding(u: UTF8String): UTF8String = {
    if (u == null) return null
    var s = u.toString
    var changed = false
    var rounds = 0
    var go = true
    while (go && rounds < 4) {
      go = false
      var dec: String = null
      if (hasMojibakePair(s)) {
        val bytes = inverseSingleByte(s)
        if (bytes != null) dec = strictUtf8(bytes, 0)
      }
      if ((dec == null || dec == s) && s.length >= 8 && hasCjkChar(s)) {
        dec = tryCjkInverse(s, GbkCharset)
        if (dec == null) dec = tryCjkInverse(s, SjisCharset)
      }
      if (dec != null && dec != s) {
        s = dec
        changed = true
        go = true
        rounds += 1
      }
    }
    if (changed) UTF8String.fromString(s) else u
  }
}

/** Charset-aware HTML decode as a codegen'd expression:
  * `decode_html(body BINARY, http_content_type STRING) -> STRING`. See
  * [[EncodingUtils]] for the resolution order. NULL body → NULL; pass ""
  * for an absent header. */
case class DecodeHtmlExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"decode_html expects (binary, string) inputs, got ($l, $r)"
        )
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(body: Any, ct: Any): Any =
    EncodingUtils.decodeHtml(
      body.asInstanceOf[Array[Byte]],
      ct.asInstanceOf[UTF8String]
    )

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, ct) => {
      s"${ev.value} = graft.plans.EncodingUtils.decodeHtml($b, $ct);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "decode_html"
}

/** Mojibake repair as a codegen'd expression:
  * `fix_encoding(text STRING) -> STRING`. See
  * [[EncodingUtils.fixEncoding]]. */
case class FixEncodingExpr(child: Expression)
    extends UnaryExpression
    with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"fix_encoding expects a string input, got $t"
        )
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    EncodingUtils.fixEncoding(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.plans.EncodingUtils.fixEncoding($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "fix_encoding"
}
