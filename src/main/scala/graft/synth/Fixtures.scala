package graft.synth

import graft.pdf.PdfWriter
import graft.pdf.PdfWriter.PageSpec
import java.nio.charset.StandardCharsets.UTF_8

/** Deterministic fixture document families — the rebuild's analog of the
  * reference's programmatic PDF factory fixtures
  * (tests/conftest.py:85-214; no binary fixtures committed,
  * CLAUDE.md:145). Families per FIXTURES.md §2; used by both the unit
  * tests and the scale generator.
  */
object Fixtures {

  // --- HTML families ------------------------------------------------------

  /** ≥3 paragraph blocks of plain content → pure_text (conftest.py:85-108). */
  val textSimpleHtml: Array[Byte] =
    """<!DOCTYPE html>
      |<html><head><title>Sample</title></head><body>
      |<p>Sample text content for extraction testing purposes here.</p>
      |<p>This document contains multiple paragraphs of readable text.</p>
      |<p>Additional content to clear the text block threshold easily.</p>
      |</body></html>""".stripMargin.getBytes(UTF_8)

  /** Body is a single image, no text blocks → pure_image (conftest.py:111-138). */
  val imageOnlyHtml: Array[Byte] =
    """<html><body><img src="scan.png" alt="Scanned invoice page with payment details and the total amount due"></body></html>"""
      .getBytes(UTF_8)

  /** Page 1: three text blocks; page 2: image only → hybrid,
    * text_pages=[1], image_pages=[2] (conftest.py:141-173).
    */
  val hybrid2pHtml: Array[Byte] =
    """<html><body>
      |<section>
      |<p>This is text content on page 1</p>
      |<p>More text here for detection</p>
      |<p>Additional content line</p>
      |</section>
      |<section>
      |<img src="diagram.png" alt="Architecture diagram showing the data flow between services">
      |</section>
      |</body></html>""".stripMargin.getBytes(UTF_8)

  /** One blank page, no blocks → treated as image/scanned → pure_image
    * (conftest.py:176-193; detector.py:226-234).
    */
  val emptyHtml: Array[Byte] = "<html><body></body></html>".getBytes(UTF_8)

  /** N pages, each with 3 text blocks → pure_text (conftest.py:196-214). */
  def multipageHtml(n: Int): Array[Byte] = {
    val sections = (1 to n).map { i =>
      s"""<section>
         |<p>Page $i content with some test words inside</p>
         |<p>Second paragraph on page $i for threshold</p>
         |<p>Third line of page $i closes the page</p>
         |</section>""".stripMargin
    }.mkString("\n")
    s"<html><body>\n$sections\n</body></html>".getBytes(UTF_8)
  }

  /** German invoice text — umlauts/ß + German number formats
    * (tests/integration/test_pipeline.py:239-265).
    */
  val germanInvoiceHtml: Array[Byte] =
    """<html><body>
      |<p>Rechnung Nr. 2024-001</p>
      |<p>Müller &amp; Söhne GmbH — Büroausstattung</p>
      |<p>Nettobetrag: 1.000,00 EUR</p>
      |<p>MwSt. (19%): 190,00 EUR</p>
      |<p>Gesamtbetrag: 1.190,00 EUR — zahlbar binnen 14 Tagen ohne Abzüge</p>
      |</body></html>""".stripMargin.getBytes(UTF_8)

  /** Main article surrounded by nav/footer/sidebar link farms — exercises
    * text-density/link-density stripping (FIXTURES.md boilerplate_page).
    */
  val boilerplateHtml: Array[Byte] =
    """<html><body>
      |<nav><ul>
      |<li><a href="/">Home</a></li><li><a href="/news">News</a></li>
      |<li><a href="/sports">Sports</a></li><li><a href="/tech">Tech</a></li>
      |</ul></nav>
      |<div class="content">
      |<h2>Quarterly results beat expectations</h2>
      |<p>The company reported revenue growth of twelve percent for the quarter,
      |driven by strong demand in its cloud division and better than expected
      |hardware margins across all regions.</p>
      |<p>Analysts had forecast a smaller increase, citing supply chain pressure
      |and slowing enterprise spending, but management raised full year guidance
      |on the earnings call and announced a new buyback program.</p>
      |<div class="share"><a href="/share/fb">Share on FB</a> <a href="/share/x">Post</a></div>
      |<p>Shares rose four percent in extended trading after the announcement,
      |adding to gains from earlier in the week as the broader market rallied.</p>
      |</div>
      |<aside><ul>
      |<li><a href="/rel1">Related: market wrap</a></li>
      |<li><a href="/rel2">Related: sector movers</a></li>
      |</ul></aside>
      |<footer><a href="/about">About</a> <a href="/contact">Contact</a> <a href="/terms">Terms</a></footer>
      |</body></html>""".stripMargin.getBytes(UTF_8)

  /** Corrupted payload: PDF magic but invalid structure → row-level error
    * record, job continues (tests/integration/test_pipeline.py:133-139).
    */
  val corruptedPdf: Array[Byte] = "%PDF-Not a valid PDF".getBytes(UTF_8)

  // --- PDF families (via PdfWriter) ----------------------------------------
  // PageSpec seqs exposed so the scale generator can re-emit the SAME
  // documents in the PDF 1.5+ layout (xref stream + ObjStm, varied
  // content filters) — identical extracted text, different container.

  val textSimplePdfSpec: Seq[PageSpec] = Seq(PageSpec(textBlocks = Seq(
    "Sample text content for extraction testing purposes here.",
    "This document contains multiple paragraphs of readable text.",
    "Additional content to clear the text block threshold easily.")))
  val textSimplePdf: Array[Byte] = PdfWriter.build(textSimplePdfSpec)

  val imageOnlyPdfSpec: Seq[PageSpec] = Seq(PageSpec(
    imageAlts = Seq("Scanned invoice page with payment details and the total amount due")))
  val imageOnlyPdf: Array[Byte] = PdfWriter.build(imageOnlyPdfSpec)

  val hybrid2pPdfSpec: Seq[PageSpec] = Seq(
    PageSpec(textBlocks = Seq(
      "This is text content on page 1",
      "More text here for detection",
      "Additional content line")),
    PageSpec(imageAlts = Seq("Architecture diagram showing the data flow between services")))
  val hybrid2pPdf: Array[Byte] = PdfWriter.build(hybrid2pPdfSpec)

  val emptyPdf: Array[Byte] = PdfWriter.build(Seq(PageSpec()))

  def multipagePdfSpec(n: Int): Seq[PageSpec] = (1 to n).map { i =>
    PageSpec(textBlocks = Seq(
      s"Page $i content with some test words inside",
      s"Second paragraph on page $i for threshold",
      s"Third line of page $i closes the page"))
  }
  def multipagePdf(n: Int): Array[Byte] = PdfWriter.build(multipagePdfSpec(n))

  val germanInvoicePdfSpec: Seq[PageSpec] = Seq(PageSpec(textBlocks = Seq(
    "Rechnung Nr. 2024-001",
    "Müller & Söhne GmbH — Büroausstattung",
    "Nettobetrag: 1.000,00 EUR",
    "MwSt. (19%): 190,00 EUR",
    "Gesamtbetrag: 1.190,00 EUR — zahlbar binnen 14 Tagen ohne Abzüge")))
  val germanInvoicePdf: Array[Byte] = PdfWriter.build(germanInvoicePdfSpec)

  /** Family name → PageSpec seq, for the modern-layout re-emission. */
  val pdfSpecs: Map[String, Seq[PageSpec]] = Map(
    "text_simple_pdf" -> textSimplePdfSpec,
    "image_only_pdf" -> imageOnlyPdfSpec,
    "hybrid_2p_pdf" -> hybrid2pPdfSpec,
    "multipage_3_pdf" -> multipagePdfSpec(3),
    "german_invoice_pdf" -> germanInvoicePdfSpec)

  /** The same PDF documents in the 1.5+ layout (xref stream + ObjStm)
    * under five content-filter variants — cached once per JVM so the
    * scale generator stays allocation-cheap per row.
    */
  lazy val modernPdfVariants: Map[String, Vector[Array[Byte]]] =
    pdfSpecs.map { case (name, spec) =>
      name -> Vector("flate", "lzw", "ahx+flate", "a85+lzw", "rl")
        .map(f => PdfWriter.buildXrefStream(spec, contentFilter = f))
    }

  /** Family name → payload, for the scale generator. */
  val families: Vector[(String, Array[Byte])] = Vector(
    "text_simple" -> textSimpleHtml,
    "image_only" -> imageOnlyHtml,
    "hybrid_2p" -> hybrid2pHtml,
    "empty" -> emptyHtml,
    "multipage_3" -> multipageHtml(3),
    "german_invoice" -> germanInvoiceHtml,
    "boilerplate" -> boilerplateHtml,
    "corrupted" -> corruptedPdf,
    "text_simple_pdf" -> textSimplePdf,
    "image_only_pdf" -> imageOnlyPdf,
    "hybrid_2p_pdf" -> hybrid2pPdf,
    "multipage_3_pdf" -> multipagePdf(3),
    "german_invoice_pdf" -> germanInvoicePdf)
}
