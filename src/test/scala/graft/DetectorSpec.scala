package graft

import graft.classify.Detector
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** Detector semantics ported from reference tests/unit/test_detector.py +
  * detector.py:95-325.
  */
class DetectorSpec extends AnyFunSuite {
  private val d = Detector.default

  private def page(textBlocks: Int, imageBlocks: Int): DocPage =
    DocPage(Vector.fill(textBlocks)(Block.text("some text here")) ++
      Vector.fill(imageBlocks)(Block.image("alt")))

  test("page analysis thresholds: text>=2, image>=1 (detector.py:108-121)") {
    val a = d.analyzePage(page(2, 0), 1)
    assert(a.is_text_dominant && !a.is_image_dominant && !a.has_mixed_content)
    val b = d.analyzePage(page(1, 0), 1)
    assert(!b.is_text_dominant && !b.is_image_dominant)
    val c = d.analyzePage(page(0, 1), 1)
    assert(!c.is_text_dominant && c.is_image_dominant)
    val m = d.analyzePage(page(3, 2), 1)
    assert(m.is_text_dominant && m.is_image_dominant && m.has_mixed_content)
    assert(m.total_blocks == 5 && m.text_blocks == 3 && m.image_blocks == 2)
  }

  test("page categorization precedence: hybrid > text > image; empty→image (detector.py:226-234)") {
    val doc = ParsedDoc(Vector(page(2, 1), page(2, 0), page(0, 1), page(0, 0), page(1, 0)))
    val c = d.classify(doc)
    assert(c.hybrid_pages == Seq(1))
    assert(c.text_pages == Seq(2))
    // Pages with insufficient blocks (empty or 1 text) treated as image.
    assert(c.image_pages == Seq(3, 4, 5))
    assert(c.pdf_type == Enums.Hybrid)
  }

  test("doc classification: all text → pure_text") {
    val c = d.classify(ParsedDoc(Vector(page(3, 0), page(2, 0))))
    assert(c.pdf_type == Enums.PureText)
    assert(c.total_pages == 2)
    assert(c.text_pages == Seq(1, 2) && c.image_pages.isEmpty && c.hybrid_pages.isEmpty)
  }

  test("doc classification: all image → pure_image") {
    val c = d.classify(ParsedDoc(Vector(page(0, 1), page(0, 2))))
    assert(c.pdf_type == Enums.PureImage)
    assert(c.image_pages == Seq(1, 2))
  }

  test("doc classification: mixed → hybrid") {
    val c = d.classify(ParsedDoc(Vector(page(3, 0), page(0, 1))))
    assert(c.pdf_type == Enums.Hybrid)
    assert(c.text_pages == Seq(1) && c.image_pages == Seq(2))
  }

  test("zero pages → unknown, confidence 0 (detector.py:200-207)") {
    val c = d.classify(ParsedDoc(Vector.empty))
    assert(c.pdf_type == Enums.Unknown)
    assert(c.total_pages == 0)
    assert(c.confidence == 0.0)
  }

  test("confidence = dominant block ratio; no blocks → 0.5 (detector.py:301-325)") {
    assert(d.confidence(8, 2, 1) == 0.8)
    assert(d.confidence(2, 8, 1) == 0.8)
    assert(d.confidence(5, 5, 2) == 0.5)
    assert(d.confidence(0, 0, 3) == 0.5)
    assert(d.confidence(0, 0, 0) == 0.0)
    assert(d.confidence(7, 0, 1) == 1.0)
  }

  test("block-count roll-ups (detector.py:214-223)") {
    val c = d.classify(ParsedDoc(Vector(page(3, 1), page(2, 2))))
    assert(c.total_text_blocks == 5)
    assert(c.total_image_blocks == 3)
    assert(c.page_analyses.map(_.page_number) == Seq(1, 2))
  }

  test("custom thresholds honored") {
    val strict = new Detector(textBlockThreshold = 5, imageBlockThreshold = 3)
    val a = strict.analyzePage(page(4, 2), 1)
    assert(!a.is_text_dominant && !a.is_image_dominant)
  }
}
