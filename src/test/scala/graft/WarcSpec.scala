package graft

import graft.model.Page
import graft.sources.Warc
import graft.synth.PageGen
import java.sql.Timestamp

/** WARC reader/writer: round-trip fidelity, HTTP header stripping,
  * malformed-record resilience, and pipeline equivalence (extraction
  * from WARC == extraction from the parquet table).
  */
class WarcSpec extends SparkSuite {

  private def page(url: String, html: String, ts: Long = 1700000000000L) =
    Page(url, new Timestamp(ts), html.getBytes("UTF-8"), "", "en")

  test("round-trip: write → parse preserves url, timestamp, payload bytes") {
    val pages = (0L until 50L).map(id => PageGen.row(42L, id))
    val parsed = Warc.parse(Warc.write(pages))
    assert(parsed.length == 50)
    parsed.zip(pages).foreach { case (a, b) =>
      assert(a.url == b.url)
      assert(a.warc_ts.getTime == b.warc_ts.getTime)
      assert(java.util.Arrays.equals(a.html, b.html), a.url)
    }
  }

  test("HTTP headers are stripped; headerless payloads pass through") {
    val body = "<html><body><p>x</p></body></html>"
    val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$body"
    assert(new String(Warc.stripHttpHeaders(http.getBytes("UTF-8")), "UTF-8") == body)
    assert(new String(Warc.stripHttpHeaders(body.getBytes("UTF-8")), "UTF-8") == body)
    // LF-only header endings
    val lf = s"HTTP/1.1 200 OK\nContent-Type: text/html\n\n$body"
    assert(new String(Warc.stripHttpHeaders(lf.getBytes("UTF-8")), "UTF-8") == body)
  }

  test("transport charset honored: cp1252 and Shift_JIS bodies extract byte-correct") {
    val german = "Straßenmaß über Gebühr — äöüß École."
    val jp = "日本語のテスト文です。"
    def record(url: String, charset: String, body: Array[Byte]): Array[Byte] = {
      val head = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=$charset\r\n\r\n")
        .getBytes("ISO-8859-1")
      val payload = head ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\n" +
        s"WARC-Date: 2023-11-14T22:13:20Z\r\nContent-Length: ${payload.length}\r\n\r\n")
        .getBytes("ISO-8859-1") ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    // Body declares NO meta charset — only the HTTP header knows.
    val cpBody = s"<html><body><article><p>$german</p></article></body></html>"
      .getBytes(java.nio.charset.Charset.forName("windows-1252"))
    // Body declares a STALE meta (windows-1252) but transport says sjis —
    // transport must win, and the normalized page must not double-decode.
    val sjBody = (s"""<html><head><meta charset="windows-1252"></head>""" +
      s"<body><article><p>$jp</p></article></body></html>")
      .getBytes(java.nio.charset.Charset.forName("Shift_JIS"))
    val parsed = Warc.parse(
      record("https://de.example/a", "windows-1252", cpBody) ++
      record("https://jp.example/b", "shift_jis", sjBody))
    assert(parsed.length == 2)
    val proc = graft.extract.Processor.default
    val rDe = proc.extract(parsed(0), "accurate")
    assert(rDe.text.contains(german), rDe.text.take(200))
    val rJp = proc.extract(parsed(1), "accurate")
    assert(rJp.text.contains(jp), rJp.text.take(200))
    assert(!rDe.text.contains("�") && !rJp.text.contains("�"))
    // A plain UTF-8 page with matching transport passes through byte-identical.
    val utf8Body = "<html><body><p>plain</p></body></html>".getBytes("UTF-8")
    val p3 = Warc.parse(record("https://c.example/c", "utf-8", utf8Body))
    assert(java.util.Arrays.equals(p3(0).html, utf8Body))
  }

  test("binary payloads with bogus transport charset are never transcoded") {
    // Real crawl servers emit charset params on binaries; transcoding
    // would corrupt every byte >= 0x80.
    def record(ct: String, body: Array[Byte]): Array[Byte] = {
      val head = (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n\r\n").getBytes("ISO-8859-1")
      val payload = head ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://x.example/i\r\n" +
        s"WARC-Date: 2023-11-14T22:13:20Z\r\nContent-Length: ${payload.length}\r\n\r\n")
        .getBytes("ISO-8859-1") ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    val gif = graft.media.MediaGen.gif(40, 30, seed = 9)
    val parsed = Warc.parse(record("image/gif; charset=iso-8859-1", gif))
    assert(java.util.Arrays.equals(parsed(0).html, gif),
      "GIF bytes were transcoded by a bogus transport charset")
    // Textual media types still normalize.
    val cp = "<p>Straße</p>".getBytes(java.nio.charset.Charset.forName("windows-1252"))
    val txt = Warc.parse(record("text/html; charset=windows-1252", cp))
    assert(new String(txt(0).html, "UTF-8").contains("Straße"))
  }

  test("non-response records and malformed garbage are skipped") {
    val good = Warc.write(Seq(page("https://a.example/x", "<p>keep</p>")))
    val info = ("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n")
      .getBytes("ISO-8859-1")
    val junk = "complete garbage\nnot a record\n".getBytes("ISO-8859-1")
    val truncated = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://b.example/y\r\n" +
      "Content-Length: 999999\r\n\r\nshort").getBytes("ISO-8859-1")
    val parsed = Warc.parse(junk ++ info ++ good ++ truncated)
    assert(parsed.length == 1 && parsed(0).url == "https://a.example/x")
  }

  test("pipeline from WARC == pipeline from parquet (end to end)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pages = (0L until 300L).map(id => PageGen.row(42L, id))
    val dir = tmpDir("warc_in")
    // Two archive files, read via binaryFile source.
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.warc"),
      Warc.write(pages.take(150)))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.warc"),
      Warc.write(pages.drop(150)))

    val proc = graft.extract.Processor.default
    val fromWarc = Warc.readPages(spark, dir)
      .mapPartitions(it => it.map(p => proc.extract(p, "balanced")))
      .select("url", "text", "word_count").orderBy("url").collect()
    val fromTable = PageGen.generate(spark, 300)
      .mapPartitions(it => it.map(p => proc.extract(p, "balanced")))
      .select("url", "text", "word_count").orderBy("url").collect()
    assert(fromWarc.length == 300)
    assert(fromWarc.sameElements(fromTable))
  }

  test("gzipped archives (per-record members, the CC layout) round-trip") {
    import org.apache.spark.sql.functions._
    val pages = (0L until 80L).map(id => PageGen.row(42L, id))
    val gz = Warc.writeGz(pages)
    assert(gz(0) == 0x1f.toByte && gz(1) == 0x8b.toByte)
    val parsed = Warc.parse(Warc.gunzipIfNeeded(gz))
    assert(parsed.length == 80)
    assert(parsed.zip(pages).forall { case (a, b) =>
      a.url == b.url && java.util.Arrays.equals(a.html, b.html) })
    // Through the Spark source too.
    val dir = tmpDir("warc_gz")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.warc.gz"), gz)
    assert(Warc.readPages(spark, dir).count() == 80)
  }

  test("ExtractJob ingests WARC archives directly (--input-format warc)") {
    import graft.app.ExtractJob
    val in = tmpDir("warc_job_in")
    val out = tmpDir("warc_job_out")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/c.warc"),
      Warc.write((0L until 200L).map(id => PageGen.row(42L, id))))
    val rows = ExtractJob.run(spark,
      ExtractJob.Args(input = in, inputFormat = "warc", out = out, buckets = 8))
    assert(rows.map(_.docs).sum == 200)
    assert(spark.read.parquet(out).count() == 200)
  }
}
