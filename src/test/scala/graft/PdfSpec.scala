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
}
