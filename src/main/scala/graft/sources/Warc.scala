package graft.sources

import graft.model.Page
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.sql.Timestamp

/** From-scratch WARC 1.0 reader/writer — the Common-Crawl container
  * format, so the engine ingests crawl archives directly instead of
  * requiring a pre-converted pages table. Co-evolved writer/parser per
  * the fixture philosophy (SURVEY.md §5.2); documented subset:
  *
  *  - records with `WARC-Type: response` become pages; other types
  *    (warcinfo, request, metadata) are skipped;
  *  - the record payload is an HTTP response: status line + headers are
  *    stripped (case-insensitive header handling, \r\n or \n endings)
  *    and the body becomes `Page.html`;
  *  - `WARC-Target-URI` → url, `WARC-Date` (ISO-8601 Z) → warc_ts;
  *  - `Content-Length` is authoritative for the payload span; malformed
  *    records are skipped, never thrown — crawl archives are
  *    adversarial.
  */
object Warc {

  private val Iso = java.time.format.DateTimeFormatter.ISO_INSTANT

  /** Write pages as a WARC byte stream (fixture/round-trip writer). */
  def write(pages: Seq[Page]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    pages.foreach { p =>
      // No charset parameter: fixture pages self-describe their encoding
      // (meta/BOM), and a transport claim that disagreed would make the
      // reader's normalizeCharset transcode them — the round-trip must be
      // byte-identical.
      val httpHead =
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
      val payload = httpHead.getBytes(ISO_8859_1) ++
        (if (p.html == null) Array.emptyByteArray else p.html)
      val date = Iso.format(java.time.Instant.ofEpochMilli(
        if (p.warc_ts == null) 0L else p.warc_ts.getTime))
      val head =
        s"""WARC/1.0\r
           |WARC-Type: response\r
           |WARC-Target-URI: ${p.url}\r
           |WARC-Date: $date\r
           |Content-Length: ${payload.length}\r
           |\r
           |""".stripMargin
      out.write(head.getBytes(ISO_8859_1))
      out.write(payload)
      out.write("\r\n\r\n".getBytes(ISO_8859_1))
    }
    out.toByteArray
  }

  /** Parse a WARC byte stream into pages (response records only). */
  def parse(bytes: Array[Byte]): Vector[Page] = {
    val out = Vector.newBuilder[Page]
    var i = 0
    val n = bytes.length

    def lineEnd(from: Int): Int = {
      var j = from
      while (j < n && bytes(j) != '\n') j += 1
      j
    }
    def lineAt(from: Int): (String, Int) = {
      val e = lineEnd(from)
      val raw = new String(bytes, from, e - from, ISO_8859_1)
      (raw.stripSuffix("\r"), math.min(e + 1, n))
    }

    while (i < n) {
      // Seek the next record marker.
      val (first, afterFirst) = lineAt(i)
      if (!first.startsWith("WARC/")) { i = afterFirst }
      else {
        // WARC headers until blank line.
        var j = afterFirst
        var url = ""; var date = ""; var tpe = ""; var len = -1L
        var halted = false
        var blank = false
        while (!blank && !halted && j < n) {
          val (line, next) = lineAt(j)
          j = next
          if (line.isEmpty) blank = true
          else {
            val c = line.indexOf(':')
            if (c > 0) {
              val k = line.substring(0, c).trim.toLowerCase
              val v = line.substring(c + 1).trim
              k match {
                case "warc-type" => tpe = v
                case "warc-target-uri" => url = v
                case "warc-date" => date = v
                case "content-length" =>
                  len = try v.toLong catch { case _: Exception => halted = true; -1L }
                case _ =>
              }
            }
          }
        }
        if (halted || len < 0 || j + len > n) {
          // Malformed record: skip to next line and rescan.
          i = j
        } else {
          if (tpe.equalsIgnoreCase("response") && url.nonEmpty) {
            val payload = java.util.Arrays.copyOfRange(bytes, j, (j + len).toInt)
            val (transportCharset, mediaType, rawBody) = splitHttpPayload(payload)
            val body = normalizeCharset(rawBody, transportCharset, mediaType)
            val ts = try new Timestamp(java.time.Instant.from(Iso.parse(date)).toEpochMilli)
              catch { case _: Exception => new Timestamp(0L) }
            out += Page(url, ts, body, "", "")
          }
          i = (j + len).toInt
        }
      }
    }
    out.result()
  }

  /** Strip the HTTP status line + headers from a response payload; a
    * payload that doesn't start with `HTTP/` is returned as-is.
    */
  def stripHttpHeaders(payload: Array[Byte]): Array[Byte] =
    splitHttpPayload(payload)._3

  private val CharsetParam =
    java.util.regex.Pattern.compile("(?i)charset\\s*=\\s*\"?([a-zA-Z0-9._\\-]+)")

  /** Split an HTTP response payload into (Content-Type charset param,
    * body). A payload that doesn't start with `HTTP/` is returned whole
    * with no charset.
    */
  def splitHttpPayload(payload: Array[Byte]): (Option[String], Option[String], Array[Byte]) = {
    if (payload.length < 5 ||
        !new String(payload, 0, 5, ISO_8859_1).equals("HTTP/")) return (None, None, payload)
    // Find the first blank line (\r\n\r\n or \n\n).
    var i = 0
    val n = payload.length
    while (i < n) {
      if (payload(i) == '\n') {
        val bodyStart =
          if (i + 1 < n && payload(i + 1) == '\n') i + 2
          else if (i + 2 < n && payload(i + 1) == '\r' && payload(i + 2) == '\n') i + 3
          else -1
        if (bodyStart > 0) {
          val head = new String(payload, 0, i, ISO_8859_1)
          val ctLine = head.split('\n').iterator.map(_.stripSuffix("\r"))
            .find(_.toLowerCase.startsWith("content-type:"))
          val cs = ctLine.flatMap { ct =>
            val m = CharsetParam.matcher(ct)
            if (m.find()) Some(m.group(1)) else None
          }
          val mediaType = ctLine.map(
            _.substring("content-type:".length).trim
              .takeWhile(_ != ';').trim.toLowerCase)
          return (cs, mediaType, java.util.Arrays.copyOfRange(payload, bodyStart, n))
        }
      }
      i += 1
    }
    (None, None, payload) // headers never ended — treat whole payload as body
  }

  /** Is this Content-Type media type textual (charset applies)? Crawl
    * servers routinely emit bogus `charset=` params on binaries; a
    * transcode there irreversibly corrupts the payload, so charset
    * normalization is gated on the media type actually being text.
    */
  def isTextualMediaType(mt: String): Boolean =
    mt.startsWith("text/") || mt.endsWith("+xml") || mt.endsWith("+json") ||
      mt == "application/xml" || mt == "application/json" ||
      mt == "application/javascript" || mt == "application/ecmascript"

  /** Charset normalization at the ingestion edge: when the TRANSPORT
    * (HTTP Content-Type) charset makes the page decode differently than
    * the payload alone would (BOM/meta/UTF-8 fallback — what the kernel
    * sniffs downstream, graft.text.Charsets), the body is transcoded to
    * UTF-8 and tagged with a UTF-8 BOM. The BOM has top sniffing
    * priority (WHATWG), so a stale in-body `<meta charset=…>` from the
    * original encoding can no longer cause a double-decode. Pages whose
    * self-description already matches the transport pass through
    * byte-identical.
    */
  def normalizeCharset(body: Array[Byte], transport: Option[String],
      mediaType: Option[String] = None): Array[Byte] = {
    import graft.text.Charsets
    if (body.isEmpty || graft.pdf.PdfParser.isPdf(body)) return body
    // A transport charset only means anything on a textual media type —
    // never transcode a binary because its server lied about charset.
    if (mediaType.exists(mt => !isTextualMediaType(mt))) return body
    val effective = Charsets.sniff(body, transport)
    val selfSniff = Charsets.sniff(body, None)
    if (effective == selfSniff) body
    else {
      val utf8 = Charsets.decode(body, transport)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val out = new Array[Byte](utf8.length + 3)
      out(0) = 0xef.toByte; out(1) = 0xbb.toByte; out(2) = 0xbf.toByte
      System.arraycopy(utf8, 0, out, 3, utf8.length)
      out
    }
  }

  /** Transparent gunzip: Common Crawl ships `.warc.gz` with one gzip
    * member PER RECORD (so archives are splittable by member);
    * GZIPInputStream consumes concatenated members, so a full-file
    * inflate yields the whole record stream. Non-gzip bytes pass
    * through.
    *
    * Inflated output is materialized as one array, so the hard ceiling
    * is ~2 GB inflated per archive (JVM array limit); typical CC gzip
    * members (~1 GB compressed, ~3-4× inflation) should instead be fed
    * through `readPages` one member at a time, which is why the writer
    * emits per-record members. Initial capacity is clamped so the
    * `length * 4` estimate can't overflow Int for multi-hundred-MB
    * inputs.
    */
  def gunzipIfNeeded(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 || bytes(0) != 0x1f.toByte || bytes(1) != 0x8b.toByte)
      return bytes
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes), 64 * 1024)
    val cap = math.min(math.max(bytes.length.toLong * 4, 64L * 1024),
      Int.MaxValue.toLong - 16).toInt
    val out = new ByteArrayOutputStream(cap)
    val buf = new Array[Byte](64 * 1024)
    try {
      var r = in.read(buf)
      while (r >= 0) { if (r > 0) out.write(buf, 0, r); r = in.read(buf) }
    } catch { case _: java.io.IOException => /* truncated member: keep what inflated */ }
    finally in.close()
    out.toByteArray
  }

  /** Gzip pages as per-record members (the CC layout). */
  def writeGz(pages: Seq[Page]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    pages.foreach { p =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(write(Seq(p)))
      gz.finish()
    }
    out.toByteArray
  }

  /** Read a directory/glob of `.warc` files into a pages Dataset via the
    * binaryFile source — one task per archive (WARC archives are the
    * crawl's split granularity; CC ships ~1 GB gzip members, so at
    * cluster scale parallelism = archive count).
    */
  def readPages(spark: org.apache.spark.sql.SparkSession, path: String):
      org.apache.spark.sql.Dataset[Page] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap(bytes => parse(gunzipIfNeeded(bytes)))
  }
}
