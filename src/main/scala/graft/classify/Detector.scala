package graft.classify

import graft.model._

/** Document-type detector — block-type classification semantics ported
  * from the reference (src/text_extraction/detector.py:95-325), applied
  * to parsed HTML/PDF payloads instead of PyMuPDF block dicts.
  *
  * Thresholds default to the reference's (detector.py:108-121):
  * text page needs ≥2 text blocks, image page needs ≥1 image block.
  */
final class Detector(
    textBlockThreshold: Int = 2,
    imageBlockThreshold: Int = 1) extends Serializable {

  /** Per-page analysis (detector.py:129-173). */
  def analyzePage(page: DocPage, pageNumber: Int): PageAnalysis = {
    val textBlocks = page.textBlocks
    val imageBlocks = page.imageBlocks
    val isTextDominant = textBlocks >= textBlockThreshold
    val isImageDominant = imageBlocks >= imageBlockThreshold
    PageAnalysis(
      page_number = pageNumber,
      text_blocks = textBlocks,
      image_blocks = imageBlocks,
      total_blocks = textBlocks + imageBlocks,
      is_text_dominant = isTextDominant,
      is_image_dominant = isImageDominant,
      has_mixed_content = isTextDominant && isImageDominant)
  }

  /** Whole-document classification (detector.py:175-275). */
  def classify(doc: ParsedDoc): Classification = {
    val totalPages = doc.totalPages
    if (totalPages == 0)
      // Empty document → UNKNOWN / confidence 0 (detector.py:200-207).
      return Classification(Enums.Unknown, 0, Nil, Nil, Nil, 0, 0, Nil, 0.0)

    val analyses = Vector.newBuilder[PageAnalysis]
    val textPages = Vector.newBuilder[Int]
    val imagePages = Vector.newBuilder[Int]
    val hybridPages = Vector.newBuilder[Int]
    var totalText = 0
    var totalImage = 0
    var nText = 0; var nImage = 0; var nHybrid = 0

    var i = 0
    while (i < totalPages) {
      val a = analyzePage(doc.pages(i), i + 1)
      analyses += a
      totalText += a.text_blocks
      totalImage += a.image_blocks
      // Page categorization precedence (detector.py:226-234); pages with
      // insufficient blocks are treated as image/scanned (CLAUDE.md:355).
      if (a.has_mixed_content) { hybridPages += a.page_number; nHybrid += 1 }
      else if (a.is_text_dominant) { textPages += a.page_number; nText += 1 }
      else { imagePages += a.page_number; nImage += 1 }
      i += 1
    }

    Classification(
      pdf_type = classifyDocType(totalPages, nText, nImage, nHybrid),
      total_pages = totalPages,
      text_pages = textPages.result(),
      image_pages = imagePages.result(),
      hybrid_pages = hybridPages.result(),
      total_text_blocks = totalText,
      total_image_blocks = totalImage,
      page_analyses = analyses.result(),
      confidence = confidence(totalText, totalImage, totalPages))
  }

  /** Document-type from page composition (detector.py:277-299). */
  def classifyDocType(totalPages: Int, textPages: Int, imagePages: Int, hybridPages: Int): String =
    if (textPages == totalPages) Enums.PureText
    else if (imagePages == totalPages) Enums.PureImage
    else Enums.Hybrid

  /** Dominant-block-ratio confidence (detector.py:301-325). */
  def confidence(totalTextBlocks: Int, totalImageBlocks: Int, totalPages: Int): Double = {
    if (totalPages == 0) return 0.0
    val totalBlocks = totalTextBlocks + totalImageBlocks
    if (totalBlocks == 0) 0.5
    else math.max(totalTextBlocks, totalImageBlocks).toDouble / totalBlocks
  }
}

object Detector {
  val default = new Detector()
}
