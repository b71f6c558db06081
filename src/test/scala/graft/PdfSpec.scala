package graft

import graft.model.Block
import graft.pdf.{PdfParser, PdfWriter}
import graft.pdf.PdfWriter.PageSpec
import graft.synth.Fixtures
import org.scalatest.funsuite.AnyFunSuite

/** Writer↔parser round-trip over the supported PDF subset (SURVEY.md
  * §7.5 risk 2 — parser and writer co-evolve; goldens pin behavior).
  */
class PdfSpec extends AnyFunSuite {

  test("magic detection") {
    assert(PdfParser.isPdf("%PDF-1.4\n".getBytes))
    assert(!PdfParser.isPdf("<html>".getBytes))
    assert(!PdfParser.isPdf(Array.emptyByteArray))
  }

  test("round-trip: text blocks per page, in order") {
    val pdf = PdfWriter.build(Seq(
      PageSpec(textBlocks = Seq("first block", "second block")),
      PageSpec(textBlocks = Seq("third block"))))
    val doc = PdfParser.parse(pdf).toOption.get
    assert(doc.totalPages == 2)
    assert(doc.pages(0).blocks.map(_.text) == Vector("first block", "second block"))
    assert(doc.pages(1).blocks.map(_.text) == Vector("third block"))
    assert(doc.pages(0).blocks.forall(_.tpe == Block.TextType))
  }

  test("round-trip: multi-line text block joins with newline") {
    val pdf = PdfWriter.build(Seq(PageSpec(textBlocks = Seq("line one\nline two"))))
    val doc = PdfParser.parse(pdf).toOption.get
    assert(doc.pages(0).blocks.map(_.text) == Vector("line one\nline two"))
  }

  test("round-trip: image XObjects with /Alt become image blocks") {
    val doc = PdfParser.parse(Fixtures.hybrid2pPdf).toOption.get
    assert(doc.totalPages == 2)
    assert(doc.pages(0).textBlocks == 3 && doc.pages(0).imageBlocks == 0)
    assert(doc.pages(1).imageBlocks == 1)
    assert(doc.pages(1).blocks(0).alt == "Architecture diagram showing the data flow between services")
  }

  test("round-trip: escapes, umlauts (Latin-1) and parens survive") {
    val text = "Müller & Söhne (GmbH) \\ 100% \"quoted\""
    val pdf = PdfWriter.build(Seq(PageSpec(textBlocks = Seq(text))))
    val doc = PdfParser.parse(pdf).toOption.get
    assert(doc.pages(0).blocks(0).text == text)
  }

  test("round-trip: uncompressed streams too") {
    val pdf = PdfWriter.build(Seq(PageSpec(textBlocks = Seq("plain stream"))), compress = false)
    val doc = PdfParser.parse(pdf).toOption.get
    assert(doc.pages(0).blocks(0).text == "plain stream")
  }

  test("empty page has zero blocks") {
    val doc = PdfParser.parse(Fixtures.emptyPdf).toOption.get
    assert(doc.totalPages == 1)
    assert(doc.pages(0).blocks.isEmpty)
  }

  test("stray 'trailer' token with no dict after it doesn't abort the parse") {
    // A 'trailer' occurrence LAST in the byte stream with no '<<'
    // anywhere after it (e.g. inside an uncompressed stream of an
    // xref-stream PDF) used to make indexOf return -1 and charAt(-1)
    // abort the whole parse.
    val pdf = PdfWriter.build(Seq(PageSpec(textBlocks = Seq("kept text"))))
    val clean = PdfParser.parse(pdf).toOption.get
    val strayed = pdf ++ "\n% see trailer".getBytes
    val doc = PdfParser.parse(strayed).toOption.get
    assert(doc.pages.map(_.blocks.map(_.text)) == clean.pages.map(_.blocks.map(_.text)))
  }

  test("DCT-bearing content stream is skipped; sibling text stream still extracts") {
    // Page with /Contents [text-stream, DCT-image-stream]: the JPEG
    // bytes deliberately contain a "(ghost) Tj" pattern that would
    // fabricate text if the raw stream leaked into the tokenizer.
    def obj(n: Int, body: String) = s"$n 0 obj\n$body\nendobj\n"
    def stream(n: Int, dict: String, data: Array[Byte]): Array[Byte] =
      s"$n 0 obj\n<< $dict /Length ${data.length} >>\nstream\n".getBytes("ISO-8859-1") ++
        data ++ "\nendstream\nendobj\n".getBytes("ISO-8859-1")
    val text = "BT\n/F1 12 Tf\n72 720 Td\n(kept text) Tj\nET\n".getBytes("ISO-8859-1")
    val fakeJpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte) ++
      "junk (ghost) Tj more junk".getBytes("ISO-8859-1") ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
    val pdf = "%PDF-1.4\n".getBytes("ISO-8859-1") ++
      obj(1, "<< /Type /Catalog /Pages 2 0 R >>").getBytes("ISO-8859-1") ++
      obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>").getBytes("ISO-8859-1") ++
      obj(3, "<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>").getBytes("ISO-8859-1") ++
      stream(4, "", text) ++
      stream(5, "/Subtype /Image /Filter /DCTDecode", fakeJpeg) ++
      "trailer\n<< /Root 1 0 R >>\n%%EOF".getBytes("ISO-8859-1")
    val doc = PdfParser.parse(pdf).toOption.get
    val texts = doc.pages.flatMap(_.blocks.map(_.text))
    assert(texts.contains("kept text"), texts)
    assert(!texts.exists(_.contains("ghost")), texts)
    // Chain form too: [/FlateDecode /DCTDecode] must also yield empty.
    import graft.pdf.PdfParser.{PDict, PName, PArr}
    val chained = PdfParser.applyFilters(fakeJpeg,
      PDict(Map("Filter" -> PArr(Vector(PName("FlateDecode"), PName("DCTDecode"))))))
    assert(chained.isEmpty)
  }

  test("corrupted PDF returns Left, never throws") {
    assert(PdfParser.parse(Fixtures.corruptedPdf).isLeft)
    assert(PdfParser.parse("%PDF-1.4\ngarbage garbage".getBytes).isLeft ||
      PdfParser.parse("%PDF-1.4\ngarbage garbage".getBytes).toOption.get.totalPages == 0)
    // Truncated real PDF: parse what's there or error, but never throw.
    val pdf = Fixtures.textSimplePdf
    (1 until pdf.length by 97).foreach { cut =>
      PdfParser.parse(pdf.take(cut)) // must not throw
    }
  }

  test("content stream TJ arrays and quote operators") {
    val content = "BT (a) Tj [(b) -120 (c)] TJ T* (d) ' ET".getBytes
    val blocks = PdfParser.parseContent(content, Map.empty)
    assert(blocks.map(_.text) == Vector("abc\nd"))
  }

  test("hex strings decode") {
    val content = "BT <48656c6c6f> Tj ET".getBytes
    val blocks = PdfParser.parseContent(content, Map.empty)
    assert(blocks.map(_.text) == Vector("Hello"))
  }

  // ---- PDF 1.5+ (xref streams + object streams) and filter breadth ------

  private val richSpec = Seq(
    PageSpec(textBlocks = Seq("first block with ümlaut ß", "second (with) parens\nand a second line")),
    PageSpec(textBlocks = Seq("page two text"), imageAlts = Seq("an image alt description")),
    PageSpec())

  test("xref-stream/ObjStm layout parses identically to classic layout") {
    val classic = PdfParser.parse(PdfWriter.build(richSpec)).toOption.get
    val modern = PdfParser.parse(PdfWriter.buildXrefStream(richSpec)).toOption.get
    assert(modern.totalPages == classic.totalPages)
    modern.pages.zip(classic.pages).foreach { case (m, c) =>
      assert(m.blocks.map(b => (b.tpe, b.text, b.alt)) ==
             c.blocks.map(b => (b.tpe, b.text, b.alt)))
    }
  }

  test("every content filter round-trips (lzw, ahx, a85, rl, chains)") {
    val classic = PdfParser.parse(PdfWriter.build(richSpec)).toOption.get
    Seq("none", "flate", "lzw", "ahx", "a85", "rl", "ahx+flate", "a85+lzw").foreach { f =>
      val doc = PdfParser.parse(PdfWriter.buildXrefStream(richSpec, contentFilter = f))
        .toOption.get
      assert(doc.totalPages == classic.totalPages, s"filter=$f")
      doc.pages.zip(classic.pages).foreach { case (m, c) =>
        assert(m.blocks.map(_.text) == c.blocks.map(_.text), s"filter=$f")
      }
    }
  }

  test("filter codecs: decode∘encode == identity (seeded fuzz)") {
    import graft.pdf.PdfFilters._
    val rnd = new scala.util.Random(0xF11E)
    (1 to 60).foreach { rep =>
      // Mix of compressible (repeated runs) and random content.
      val n = rnd.nextInt(5000)
      val data = new Array[Byte](n)
      var i = 0
      while (i < n) {
        if (rnd.nextInt(4) == 0) {
          val b = rnd.nextInt().toByte
          val run = math.min(n - i, 1 + rnd.nextInt(300))
          java.util.Arrays.fill(data, i, i + run, b); i += run
        } else { data(i) = rnd.nextInt().toByte; i += 1 }
      }
      assert(java.util.Arrays.equals(asciiHexDecode(asciiHexEncode(data)), data), s"ahx rep$rep")
      assert(java.util.Arrays.equals(ascii85Decode(ascii85Encode(data)), data), s"a85 rep$rep")
      assert(java.util.Arrays.equals(runLengthDecode(runLengthEncode(data)), data), s"rl rep$rep")
      assert(java.util.Arrays.equals(lzwDecode(lzwEncode(data)), data), s"lzw rep$rep")
      assert(java.util.Arrays.equals(inflate(deflate(data)), data), s"flate rep$rep")
    }
    // LZW dictionary growth across the 9→10→11→12-bit boundaries needs
    // >4096 distinct sequences: a long low-entropy pattern forces it.
    val big = Array.tabulate[Byte](200000)(i => ((i * 31 + i / 7) & 0xff).toByte)
    assert(java.util.Arrays.equals(lzwDecode(lzwEncode(big)), big), "lzw big")
  }

  test("png predictor: up-predicted rows unpredict to original") {
    import graft.pdf.PdfFilters._
    val rnd = new scala.util.Random(42)
    Seq(1, 5, 6, 16).foreach { cols =>
      val rows = 17
      val data = Array.fill[Byte](cols * rows)(rnd.nextInt().toByte)
      assert(java.util.Arrays.equals(pngUnpredict(pngPredictUp(data, cols), cols), data),
        s"cols=$cols")
    }
  }

  test("encrypted PDF (RC4, empty user password) decrypts to the identical document") {
    val clear = PdfWriter.build(Seq(
      PageSpec(textBlocks = Seq("secret text body", "second (escaped) line\nwith break")),
      PageSpec(textBlocks = Seq("page two"), imageAlts = Seq("an alt description"))))
    val enc = PdfWriter.encryptRc4(clear)
    val encS = new String(enc, java.nio.charset.StandardCharsets.ISO_8859_1)
    // It is really ciphertext: no plaintext content survives.
    assert(!encS.contains("secret text"))
    assert(!encS.contains("an alt description"))
    assert(encS.contains("/Encrypt"))
    // And it parses to the byte-identical document.
    assert(PdfParser.parse(enc) == PdfParser.parse(clear))
  }

  test("kernel extracts encrypted PDFs byte-identically to their clear form") {
    val proc = graft.extract.Processor.default
    def extractOf(bytes: Array[Byte]) = proc.extract(
      graft.model.KernelPage("https://t.example/enc", bytes, "en"), "balanced")
    val clear = PdfWriter.build(Seq(
      PageSpec(textBlocks = Seq("alpha beta gamma", "delta")),
      PageSpec(imageAlts = Seq("figure description"))))
    val a = extractOf(clear)
    val b = extractOf(PdfWriter.encryptRc4(clear))
    assert(b.success)
    assert(a.text == b.text && a.word_count == b.word_count &&
      a.pdf_type == b.pdf_type && a.total_pages == b.total_pages)
  }

  test("encrypted PDF survives truncation/mutation fuzz without throwing") {
    val enc = PdfWriter.encryptRc4(PdfWriter.build(Seq(
      PageSpec(textBlocks = Seq("alpha", "beta")), PageSpec(imageAlts = Seq("alt")))))
    // Truncation at every stride: parse returns Left or a partial doc,
    // never throws — crypto paths included.
    (0 until enc.length by 37).foreach { cut =>
      PdfParser.parse(enc.take(cut))
    }
    // Byte mutations across the file (incl. the Encrypt dict, O/U hex
    // strings, and ciphertext): same no-throw guarantee.
    val rng = new scala.util.Random(23)
    (1 to 60).foreach { _ =>
      val b = enc.clone()
      b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
      PdfParser.parse(b)
    }
  }

  test("encrypted PDF: unsupported/locked variants return explicit errors") {
    val classic = PdfWriter.build(Seq(PageSpec(textBlocks = Seq("secret"))))
    val s = new String(classic, java.nio.charset.StandardCharsets.ISO_8859_1)
    // Dangling /Encrypt reference.
    val dangling = s.replace("/Root 1 0 R", "/Root 1 0 R /Encrypt 99 0 R")
    assert(PdfParser.parse(dangling.getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1)) ==
      Left("encrypted PDF: unresolvable /Encrypt"))
    // An unpublished V value refuses loudly.
    val enc = PdfWriter.encryptRc4(classic)
    val v3 = new String(enc, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/V 2 /R 3", "/V 3 /R 3")
    assert(PdfParser.parse(v3.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)) ==
      Left("encrypted PDF: unsupported V=3 R=3"))
    // An unknown crypt-filter method refuses loudly.
    val badCfm = new String(PdfWriter.encryptStandard(classic, "aesv2"),
      java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/CFM /AESV2", "/CFM /AESV9")
    assert(PdfParser.parse(badCfm.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)) ==
      Left("encrypted PDF: unsupported crypt filter AESV9/AESV9"))
    // A real (non-empty) user password: tampered /U never matches.
    val locked = new String(enc, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replaceFirst("/U <[0-9a-f]+>", "/U <" + "00" * 32 + ">")
    assert(PdfParser.parse(locked.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)) ==
      Left("encrypted PDF: password required"))
  }

  test("AES-encrypted PDFs (V4/R4, V5/R5, V5/R6) decrypt to the identical document") {
    val clear = PdfWriter.build(Seq(
      PageSpec(textBlocks = Seq("aes secret body", "second (escaped) line\nwith break")),
      PageSpec(textBlocks = Seq("page two"), imageAlts = Seq("an alt description"))))
    val want = PdfParser.parse(clear)
    assert(want.isRight)
    Seq("aesv2", "aesv3-r5", "aesv3-r6").foreach { variant =>
      val enc = PdfWriter.encryptStandard(clear, variant)
      val encS = new String(enc, java.nio.charset.StandardCharsets.ISO_8859_1)
      assert(!encS.contains("aes secret"), variant)
      assert(!encS.contains("an alt description"), variant)
      assert(encS.contains("/Encrypt"), variant)
      assert(PdfParser.parse(enc) == want, variant)
    }
  }

  test("kernel extracts AES-encrypted PDFs byte-identically to their clear form") {
    val proc = graft.extract.Processor.default
    def extractOf(bytes: Array[Byte]) = proc.extract(
      graft.model.KernelPage("https://t.example/aes", bytes, "en"), "balanced")
    val clear = PdfWriter.build(Seq(
      PageSpec(textBlocks = Seq("alpha beta gamma", "delta")),
      PageSpec(imageAlts = Seq("figure description"))))
    val a = extractOf(clear)
    Seq("aesv2", "aesv3-r5", "aesv3-r6").foreach { variant =>
      val b = extractOf(PdfWriter.encryptStandard(clear, variant))
      assert(b.success, variant)
      assert(a.text == b.text && a.word_count == b.word_count &&
        a.pdf_type == b.pdf_type && a.total_pages == b.total_pages, variant)
    }
  }

  test("AES-encrypted PDFs survive truncation/mutation fuzz without throwing") {
    Seq("aesv2", "aesv3-r6").foreach { variant =>
      val enc = PdfWriter.encryptStandard(PdfWriter.build(Seq(
        PageSpec(textBlocks = Seq("alpha", "beta")),
        PageSpec(imageAlts = Seq("alt")))), variant)
      (0 until enc.length by 37).foreach { cut =>
        PdfParser.parse(enc.take(cut))
      }
      // Byte mutations across the file (incl. U/UE/O/OE hex strings,
      // the CF dict, IVs, and ciphertext): parse returns Left or a
      // partial doc, never throws — AES pad handling included.
      val rng = new scala.util.Random(29)
      (1 to 60).foreach { _ =>
        val b = enc.clone()
        b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
        PdfParser.parse(b)
      }
    }
  }

  test("aesDecrypt: mid-block truncation recovers the whole-block prefix") {
    val key = java.security.MessageDigest.getInstance("SHA-256")
      .digest("k".getBytes("UTF-8"))
    val iv = java.security.MessageDigest.getInstance("MD5").digest("iv".getBytes("UTF-8"))
    val plain = (0 until 80).map(i => ('a' + i % 26).toChar).mkString
      .getBytes("ISO-8859-1") // 80 bytes = 5 blocks
    val full = graft.pdf.PdfCrypt.aesEncrypt(key, iv, plain) // 16 IV + 96 ct (pad)
    // Chop mid-block: 16 IV + 32 whole ct bytes + 5 ragged → the two
    // complete leading blocks decrypt; the tail is dropped, not the doc.
    val truncated = full.take(16 + 32 + 5)
    val got = graft.pdf.PdfCrypt.aesDecrypt(key, truncated)
    assert(java.util.Arrays.equals(got, plain.take(32)),
      s"expected 32-byte prefix, got ${got.length} bytes")
    // Untruncated round-trip strips the PKCS#7 pad exactly.
    assert(java.util.Arrays.equals(graft.pdf.PdfCrypt.aesDecrypt(key, full), plain))
    // Sub-two-block input stays empty (no whole ciphertext block).
    assert(graft.pdf.PdfCrypt.aesDecrypt(key, full.take(20)).isEmpty)
  }

  test("AES V5: a real (non-empty) user password refuses with password required") {
    val clear = PdfWriter.build(Seq(PageSpec(textBlocks = Seq("secret"))))
    val enc = PdfWriter.encryptStandard(clear, "aesv3-r6")
    // Corrupt the /U validation hash: the empty password no longer opens.
    val locked = new String(enc, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replaceFirst("/U <[0-9a-f]{4}", "/U <ffff")
    assert(PdfParser.parse(locked.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)) ==
      Left("encrypted PDF: password required"))
  }

  test("corpus golden: modern-layout PDFs extract byte-identically to classic") {
    val proc = graft.extract.Processor.default
    def extractOf(bytes: Array[Byte]) = proc.extract(
      graft.model.Page("https://t.example/p", new java.sql.Timestamp(0L), bytes, "", "en"),
      "balanced")
    Fixtures.pdfSpecs.keys.foreach { fam =>
      val classic = extractOf(Fixtures.families.find(_._1 == fam).get._2)
      Fixtures.modernPdfVariants(fam).zipWithIndex.foreach { case (bytes, v) =>
        val modern = extractOf(bytes)
        assert(modern.text == classic.text, s"$fam variant $v")
        assert(modern.pdf_type == classic.pdf_type, s"$fam variant $v")
        assert(modern.word_count == classic.word_count, s"$fam variant $v")
      }
    }
  }

  test("malformed ObjStm / xref stream degrade, never throw") {
    val modern = PdfWriter.buildXrefStream(richSpec)
    val s = new String(modern, java.nio.charset.StandardCharsets.ISO_8859_1)
    // Corrupt the ObjStm's compressed bytes: parser should skip it and
    // still not throw (pages may be lost — that is the degraded result).
    val broken = modern.clone()
    val stmAt = s.indexOf("/Type /ObjStm")
    val dataAt = s.indexOf("stream\n", stmAt) + 7
    (0 until 16).foreach(i => broken(dataAt + i) = 0x55)
    PdfParser.parse(broken) // must not throw
    // Truncations at every region.
    Seq(10, 100, modern.length / 2, modern.length - 5).foreach { cut =>
      PdfParser.parse(java.util.Arrays.copyOfRange(modern, 0, cut))
    }
  }

  test("adversarial value nesting is depth-capped, never a stack overflow") {
    // Crawl PDFs are attacker-controlled; 100k-deep arrays/dicts in an
    // object body must degrade to a malformed-value stop (None / skipped
    // object), not drive parseValueAt past the JVM stack.
    val deepArr = "%PDF-1.4\n1 0 obj\n" + ("[" * 100000) + ("]" * 100000) + "\nendobj\n"
    PdfParser.parse(deepArr.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)) // must not throw
    val deepDict = "%PDF-1.4\n1 0 obj\n" + ("<< /K " * 100000) + "1" + (" >>" * 100000) + "\nendobj\n"
    PdfParser.parse(deepDict.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)) // must not throw
    // Sanity: moderate nesting (within the cap) still parses.
    val ok = PdfParser.parseValueAt("[[[[[[ 1 2 3 ]]]]]]", 0)
    assert(ok.isDefined)
  }
}
