package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Byte-level crawl ingestion expressions: the step between a WARC
 * payload (`binary`) and the text pipeline (`string`). Real crawls are
 * NOT all UTF-8 — a large fraction of the web still serves legacy
 * single-byte encodings, UTF-16 with BOMs, and mislabeled headers — so
 * a charset sniffing/decoding pass is mandatory before any text
 * operator sees the data. The detection order is the public WHATWG
 * Encoding sniffing algorithm (BOM > transport header > in-document
 * meta prescan > content heuristic), simplified to the labels that
 * dominate crawl corpora.
 *
 * All three expressions are row-local, allocation-bounded (the meta
 * prescan looks at the first 1024 bytes only, per the HTML spec's
 * prescan window) and stay inside whole-stage codegen via the
 * reference-call pattern — at 100 TB this runs inside the same scan
 * stage as the WARC record parse, adding zero shuffles.
 */
object CrawlBytes {

  /** WHATWG-style label canonicalization for the encodings that
    * dominate crawls. ISO-8859-1/latin1/ascii map to windows-1252 (the
    * WHATWG rule: servers that say latin1 serve cp1252 bytes); unknown
    * labels fall back to windows-1252, the spec's default for
    * undeclared legacy content. */
  def canonical(label: String): String = {
    val l = label.trim.toLowerCase.stripPrefix("\"").stripSuffix("\"")
    l match {
      case "utf-8" | "utf8" | "unicode-1-1-utf-8" => "utf-8"
      case "utf-16" | "utf-16le" | "ucs-2" => "utf-16le"
      case "utf-16be" => "utf-16be"
      case "iso-8859-1" | "iso8859-1" | "latin1" | "l1" | "ascii" | "us-ascii" |
           "cp1252" | "windows-1252" | "x-cp1252" | "ansi_x3.4-1968" => "windows-1252"
      case other =>
        // Charset.isSupported THROWS IllegalCharsetNameException for
        // labels like "_autodetect" (leading '_'/'.'/'-') — untrusted
        // crawl metadata must fall back, never kill the stage
        val supported =
          try other.nonEmpty && java.nio.charset.Charset.isSupported(other)
          catch { case _: java.nio.charset.IllegalCharsetNameException => false }
        if (supported) other else "windows-1252"
    }
  }

  private val CtCharset = "(?i)charset\\s*=\\s*\"?([A-Za-z0-9._\\-]+)".r
  private val MetaCharset =
    "(?i)<meta[^>]+charset\\s*=\\s*[\"']?([A-Za-z0-9._\\-]+)".r
  private val XmlDecl =
    "(?i)^\\s*<\\?xml[^>]*encoding\\s*=\\s*[\"']([A-Za-z0-9._\\-]+)".r

  /** Detected charset label for a payload: BOM first (authoritative),
    * then the transport `Content-Type` charset parameter, then an
    * HTML-meta / XML-declaration prescan of the first 1024 bytes, then
    * the content heuristic (valid UTF-8 → utf-8, else windows-1252).
    * `httpCt` empty/null means no transport hint. */
  def sniff(bytes: Array[Byte], httpCt: String): String = {
    bomCharset(bytes) match {
      case Some(c) => return c
      case None =>
    }
    if (httpCt != null && httpCt.nonEmpty)
      CtCharset.findFirstMatchIn(httpCt) match {
        case Some(m) => return canonical(m.group(1))
        case None =>
      }
    val window = new String(bytes, 0, math.min(bytes.length, 1024), "ISO-8859-1")
    MetaCharset.findFirstMatchIn(window) match {
      case Some(m) =>
        // WHATWG "get an encoding from a meta element": a meta-declared
        // UTF-16 demotes to UTF-8 — if the bytes really were UTF-16,
        // the ASCII meta tag itself would be unreadable
        val c = canonical(m.group(1))
        return if (c == "utf-16le" || c == "utf-16be") "utf-8" else c
      case None =>
    }
    XmlDecl.findFirstMatchIn(window) match {
      case Some(m) => return canonical(m.group(1))
      case None =>
    }
    if (validUtf8(bytes)) "utf-8" else "windows-1252"
  }

  /** (charset, BOM length) when the payload opens with a byte-order
    * mark. */
  private def bomCharset(b: Array[Byte]): Option[String] = bomLen(b) match {
    case 3 => Some("utf-8")
    case 2 => Some(if ((b(0) & 0xFF) == 0xFF) "utf-16le" else "utf-16be")
    case _ => None
  }

  private def bomLen(b: Array[Byte]): Int =
    if (b.length >= 3 && (b(0) & 0xFF) == 0xEF && (b(1) & 0xFF) == 0xBB &&
        (b(2) & 0xFF) == 0xBF) 3
    else if (b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xFE) 2
    else if (b.length >= 2 && (b(0) & 0xFF) == 0xFE && (b(1) & 0xFF) == 0xFF) 2
    else 0

  /** Strict UTF-8 validation (single scan, no allocation): overlong
    * forms, surrogates and out-of-range code points rejected. Pure
    * ASCII validates — ASCII bytes decode identically under utf-8 and
    * cp1252, so utf-8 is the safe label for them. */
  def validUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xFF
      if (c < 0x80) i += 1
      else {
        val (need, min) =
          if (c >= 0xC2 && c <= 0xDF) (1, 0x80)
          else if (c >= 0xE0 && c <= 0xEF) (2, 0x800)
          else if (c >= 0xF0 && c <= 0xF4) (3, 0x10000)
          else return false
        if (i + need >= b.length) return false
        var cp = c & (0x3F >> need)
        var j = 1
        while (j <= need) {
          val t = b(i + j) & 0xFF
          if ((t & 0xC0) != 0x80) return false
          cp = (cp << 6) | (t & 0x3F)
          j += 1
        }
        if (cp < min || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) return false
        i += need + 1
      }
    }
    true
  }

  /** Bounded-prefix UTF-8 validation for MIME ROUTING: scans at most
    * `limit` bytes and tolerates one multi-byte sequence truncated by
    * the window edge. Charset detection (`sniff`) keeps the full scan
    * — it decides how bytes are DECODED; routing only picks a bucket,
    * and file(1)/WHATWG both sniff a bounded resource header. */
  def validUtf8Prefix(b: Array[Byte], limit: Int): Boolean = {
    val until = math.min(b.length, limit)
    var i = 0
    while (i < until) {
      val c = b(i) & 0xFF
      if (c < 0x80) i += 1
      else {
        val (need, min) =
          if (c >= 0xC2 && c <= 0xDF) (1, 0x80)
          else if (c >= 0xE0 && c <= 0xEF) (2, 0x800)
          else if (c >= 0xF0 && c <= 0xF4) (3, 0x10000)
          else return false
        if (i + need >= until)
          return until < b.length // window-truncated sequence passes; payload-truncated fails
        var cp = c & (0x3F >> need)
        var j = 1
        while (j <= need) {
          val t = b(i + j) & 0xFF
          if ((t & 0xC0) != 0x80) return false
          cp = (cp << 6) | (t & 0x3F)
          j += 1
        }
        if (cp < min || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) return false
        i += need + 1
      }
    }
    true
  }

  /** Detect + decode in one call: BOM stripped, malformed sequences
    * replaced with U+FFFD (never thrown — a crawl row must not kill a
    * stage). */
  def decode(bytes: Array[Byte], httpCt: String): String = {
    val charset = sniff(bytes, httpCt)
    val skip = bomLen(bytes)
    val cs = java.nio.charset.Charset.forName(charset)
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes, skip, bytes.length - skip)).toString
  }

  /** Magic-byte MIME sniffing (the `file(1)` / WHATWG MIME-sniffing
    * prefix table, crawl-relevant subset). Text kinds are detected
    * after skipping a BOM and leading whitespace; bytes that are
    * neither a known container nor valid UTF-8 fall to
    * application/octet-stream. */
  def mime(bytes: Array[Byte]): String = {
    def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xFF else -1
    def ascii(off: Int, s: String): Boolean = {
      if (off + s.length > bytes.length) return false
      var i = 0
      while (i < s.length) {
        if ((bytes(off + i) & 0xFF) != s.charAt(i)) return false
        i += 1
      }
      true
    }
    if (ascii(0, "%PDF")) return "application/pdf"
    if (at(0) == 0x89 && ascii(1, "PNG")) return "image/png"
    if (at(0) == 0xFF && at(1) == 0xD8 && at(2) == 0xFF) return "image/jpeg"
    if (ascii(0, "GIF87a") || ascii(0, "GIF89a")) return "image/gif"
    if (ascii(0, "BM")) return "image/bmp"
    if (ascii(0, "RIFF")) {
      if (ascii(8, "WAVE")) return "audio/wav"
      if (ascii(8, "WEBP")) return "image/webp"
      if (ascii(8, "AVI ")) return "video/x-msvideo"
      return "application/octet-stream"
    }
    if (at(0) == 0x1F && at(1) == 0x8B) return "application/gzip"
    if (at(0) == 0x28 && at(1) == 0xB5 && at(2) == 0x2F && at(3) == 0xFD)
      return "application/zstd"
    if (ascii(0, "PK\u0003\u0004")) return "application/zip"
    if (ascii(4, "ftyp")) return "video/mp4"
    if (ascii(0, "OggS")) return "application/ogg"
    if (ascii(0, "fLaC")) return "audio/flac"
    if (ascii(0, "ID3") || (at(0) == 0xFF && (at(1) | 0x01) == 0xFB))
      return "audio/mpeg"
    if (ascii(0, "WARC/")) return "application/warc"
    // UTF-16 BOM: textual by definition (WHATWG); probe tags through
    // a decoded window since ASCII byte-compare can't see 2-byte chars
    if (bomLen(bytes) == 2) {
      val cs = if ((bytes(0) & 0xFF) == 0xFF) "UTF-16LE" else "UTF-16BE"
      val window = new String(bytes, 2, math.min(bytes.length - 2, 128), cs)
        .dropWhile(c => c == ' ' || c == '\t' || c == '\r' || c == '\n')
        .toLowerCase
      if (window.startsWith("<!doctype html") || window.startsWith("<html") ||
          window.startsWith("<head") || window.startsWith("<body") ||
          window.startsWith("<script") || window.startsWith("<!--")) return "text/html"
      if (window.startsWith("<?xml")) return "text/xml"
      if (window.startsWith("<svg")) return "image/svg+xml"
      return "text/plain"
    }
    // text kinds: skip BOM + whitespace, case-insensitive tag probe
    var i = bomLen(bytes)
    while (i < bytes.length && (at(i) == ' ' || at(i) == '\t' || at(i) == '\r' || at(i) == '\n'))
      i += 1
    def tag(s: String): Boolean = {
      if (i + s.length > bytes.length) return false
      var j = 0
      while (j < s.length) {
        val c = bytes(i + j) & 0xFF
        val lower = if (c >= 'A' && c <= 'Z') c + 32 else c
        if (lower != s.charAt(j)) return false
        j += 1
      }
      true
    }
    if (tag("<!doctype html") || tag("<html") || tag("<head") || tag("<body") ||
        tag("<script") || tag("<!--")) return "text/html"
    if (tag("<?xml")) return "text/xml"
    if (tag("<svg")) return "image/svg+xml"
    // ONE bounded text probe (4 KB window) decides the remaining
    // routes — a 16 MB payload must not pay a full-payload validation
    // (twice, for brace-prefixed binaries) just to pick a MIME bucket
    val textual = validUtf8Prefix(bytes, 4096)
    if ((tag("{") || tag("[")) && textual) return "application/json"
    if (textual) "text/plain" else "application/octet-stream"
  }
}

/** `sniff_charset(payload, http_content_type)` → charset label.
  * Empty `http_content_type` means no transport hint (wrap nullable
  * columns in `coalesce(ct, '')` — the Column wrappers do). */
case class SniffCharset(payload: Expression, httpCt: Expression)
    extends BinaryExpression {

  override def left: Expression = payload
  override def right: Expression = httpCt
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (payload.dataType, httpCt.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (p, c) => TypeCheckResult.TypeCheckFailure(
        s"sniff_charset expects (binary, string), got (${p.sql}, ${c.sql})")
    }

  def sniffU(bytes: Array[Byte], ct: UTF8String): UTF8String =
    UTF8String.fromString(CrawlBytes.sniff(bytes, if (ct == null) "" else ct.toString))

  override protected def nullSafeEval(p: Any, c: Any): Any =
    sniffU(p.asInstanceOf[Array[Byte]], c.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sc", this, classOf[SniffCharset].getName)
    nullSafeCodeGen(ctx, ev, (p, c) => s"${ev.value} = $ref.sniffU($p, $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(payload = newLeft, httpCt = newRight)

  override def prettyName: String = "sniff_charset"
}

/** `decode_charset(payload, http_content_type)` → decoded text
  * (BOM-stripped, malformed bytes → U+FFFD). */
case class DecodeCharset(payload: Expression, httpCt: Expression)
    extends BinaryExpression {

  override def left: Expression = payload
  override def right: Expression = httpCt
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (payload.dataType, httpCt.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (p, c) => TypeCheckResult.TypeCheckFailure(
        s"decode_charset expects (binary, string), got (${p.sql}, ${c.sql})")
    }

  def decodeU(bytes: Array[Byte], ct: UTF8String): UTF8String =
    UTF8String.fromString(CrawlBytes.decode(bytes, if (ct == null) "" else ct.toString))

  override protected def nullSafeEval(p: Any, c: Any): Any =
    decodeU(p.asInstanceOf[Array[Byte]], c.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dc", this, classOf[DecodeCharset].getName)
    nullSafeCodeGen(ctx, ev, (p, c) => s"${ev.value} = $ref.decodeU($p, $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(payload = newLeft, httpCt = newRight)

  override def prettyName: String = "decode_charset"
}

/** `sniff_mime(payload)` → MIME label from the magic-byte table. */
case class SniffMime(payload: Expression) extends UnaryExpression {

  override def child: Expression = payload
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = payload.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sniff_mime expects binary, got ${t.sql}")
  }

  def mimeU(bytes: Array[Byte]): UTF8String =
    UTF8String.fromString(CrawlBytes.mime(bytes))

  override protected def nullSafeEval(p: Any): Any =
    mimeU(p.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sm", this, classOf[SniffMime].getName)
    nullSafeCodeGen(ctx, ev, p => s"${ev.value} = $ref.mimeU($p);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(payload = newChild)

  override def prettyName: String = "sniff_mime"
}
