package graft

import graft.extract.Processor
import graft.html.BlockSegmenter
import graft.model.Page
import org.scalatest.funsuite.AnyFunSuite

/** Golden behavior for richer HTML structures (tables, lists,
  * definition lists, figures, quotes, inline formatting). Pins the
  * documented extraction contract: one text block per leaf block
  * element, whitespace collapsed (including inside `pre` — deliberate
  * normalization subset), inline markup flattened into its block's run,
  * `<br>` treated as inline whitespace, figure images taking the OCR
  * path with alt text.
  */
class StructureGoldenSpec extends AnyFunSuite {

  private val proc = Processor.default
  private def extract(html: String, quality: String = "balanced") =
    proc.extract(Page("u", new java.sql.Timestamp(0),
      html.getBytes("UTF-8"), "", "en"), quality)

  test("table: one block per cell, row-major order") {
    val rec = extract("""<html><body><table><thead><tr><th>Name</th><th>Qty</th></tr></thead>
      <tbody><tr><td>Widget</td><td>3</td></tr><tr><td>Gadget</td><td>7</td></tr></tbody></table></body></html>""")
    assert(rec.pdf_type == "pure_text")
    assert(rec.text == "--- Page 1 ---\nName\nQty\nWidget\n3\nGadget\n7\n")
    assert(rec.word_count == 10) // incl. marker tokens "---","Page","1","---"
  }

  test("nested list: depth-first leaf order preserved") {
    val rec = extract("""<html><body><ul><li>alpha<ul><li>beta</li><li>gamma</li></ul></li><li>delta</li></ul></body></html>""")
    assert(rec.text == "--- Page 1 ---\nalpha\nbeta\ngamma\ndelta\n")
  }

  test("definition list: dt/dd alternate as blocks") {
    val rec = extract("""<html><body><dl><dt>Term</dt><dd>Definition text</dd><dt>Other</dt><dd>More text</dd></dl></body></html>""")
    assert(rec.text == "--- Page 1 ---\nTerm\nDefinition text\nOther\nMore text\n")
  }

  test("blockquote and pre: whitespace collapsed (documented subset)") {
    val rec = extract("""<html><body><blockquote>Quoted wisdom here</blockquote><pre>  raw   spacing  kept?</pre></body></html>""")
    assert(rec.text == "--- Page 1 ---\nQuoted wisdom here\nraw spacing kept?\n")
  }

  test("inline formatting flattens into one block run; anchors counted") {
    val html = """<html><body><p>Some <b>bold</b> and <i>italic <u>nested</u></i> text with <a href="/x">a link</a>.</p></body></html>"""
    val doc = BlockSegmenter.parseHtml(html)
    val b = doc.pages(0).blocks(0)
    assert(b.text == "Some bold and italic nested text with a link .")
    assert(b.anchorChars == 6) // "a link"
  }

  test("<br> is inline whitespace, not a block boundary") {
    val rec = extract("""<html><body><p>line one<br>line two<br/>line three</p></body></html>""")
    assert(rec.text == "--- Page 1 ---\nline one line two line three\n")
  }

  test("figure: image block takes OCR path; alt text surfaces") {
    val rec = extract("""<html><body><figure><img src="x.png" alt="A chart"><figcaption>Chart of results</figcaption></figure></body></html>""")
    // 1 text + 1 image block → image-dominant page → pure_image →
    // balanced routes to OCR; boilerplate backend surfaces the alt.
    assert(rec.pdf_type == "pure_image")
    assert(rec.extraction_method == "hybrid (direct + llm_ocr)")
    assert(rec.text == "--- Page 1 (OCR: llm_ocr) ---\nA chart")
  }
}
