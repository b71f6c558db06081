package graft.extract

import graft.boiler.Boilerplate
import graft.model.Page
import graft.text.PyText

/** Main-content record: boilerplate-stripped text for every page. */
final case class MainContentRecord(
    url: String,
    success: Boolean,
    total_pages: Int,
    text: String,
    word_count: Int,
    removed_ratio: Double, // fraction of raw chars dropped as boilerplate
    error: Option[String])

/** Unconditional main-content extraction — the web-first surface of the
  * north star ("HTML boilerplate strip"). The reference-faithful
  * `Processor` applies the boilerplate kernel only where its routing
  * matrix sends pages to the OCR role (image/hybrid; the direct path is
  * the raw text layer, exactly like PyMuPDF `get_text`); this operator
  * applies the same deterministic density heuristics to EVERY page —
  * what a training-data pipeline wants from crawl HTML. Same parser,
  * same kernel, different policy; composition mirrors the Processor
  * (blank pages skipped, pages joined with a blank line).
  */
object MainContent {

  private val boiler = Boilerplate.default

  def extract(page: Page): MainContentRecord = {
    DocParser.parse(page.html) match {
      case Left(err) =>
        MainContentRecord(page.url, success = false, 0, "", 0, 0.0, Some(err))
      case Right(doc) =>
        val parts = doc.pages.map(boiler.extract).filterNot(PyText.isBlank)
        val text = parts.mkString("\n\n")
        val rawChars = doc.pages.iterator
          .flatMap(_.blocks.iterator).map(b => b.text.length + b.alt.length).sum
        val removed =
          if (rawChars == 0) 0.0
          else math.max(0.0, 1.0 - text.length.toDouble / rawChars)
        MainContentRecord(page.url, success = true, doc.totalPages, text,
          PyText.wordCount(text), removed, None)
    }
  }
}
