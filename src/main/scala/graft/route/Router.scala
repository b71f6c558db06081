package graft.route

import graft.model._

/** Quality × doc-type routing — matrix, page selection, cost model and
  * reasoning string ported verbatim from the reference
  * (src/text_extraction/router.py:75-329).
  *
  * |  type      | fast        | balanced      | accurate       |
  * |------------|-------------|---------------|----------------|
  * | pure_text  | DIRECT_ONLY | DIRECT_ONLY   | DIRECT_ONLY    |
  * | pure_image | DIRECT_ONLY | OCR_ALL       | OCR_ALL        |
  * | hybrid     | DIRECT_ONLY | OCR_SELECTIVE | OCR_SELECTIVE  |
  * | unknown    | DIRECT_ONLY | DIRECT_ONLY   | DIRECT_ONLY    |
  */
final class Router(
    hasOcrBackend: Boolean = true,
    costPerOcrPage: Double = Router.DefaultCostPerOcrPage,
    timePerOcrPage: Double = Router.DefaultTimePerOcrPage,
    timePerDirectPage: Double = Router.DefaultTimePerDirectPage) extends Serializable {

  def route(classification: Classification, qualityRaw: String): RoutingDecision = {
    // Invalid quality normalizes to balanced (router.py:134-136).
    val quality =
      if (Enums.Qualities.contains(qualityRaw)) qualityRaw else Enums.Balanced

    var strategy = determineStrategy(classification.pdf_type, quality)
    // No OCR backend → force direct only (router.py:142-143).
    if (strategy != Enums.DirectOnly && !hasOcrBackend) strategy = Enums.DirectOnly

    val (directPages, ocrPages) = selectPages(classification, strategy, quality)
    val est = estimateCost(ocrPages.length, directPages.length)
    val reasoning = generateReasoning(
      classification.pdf_type, quality, strategy, directPages, ocrPages)

    RoutingDecision(
      pdf_type = classification.pdf_type,
      strategy = strategy,
      direct_pages = directPages,
      ocr_pages = ocrPages,
      estimated_cost = est.total_cost_eur,
      estimated_time_seconds = est.total_time_seconds,
      quality = quality,
      total_pages = classification.total_pages,
      reasoning = reasoning)
  }

  /** Cost model (router.py:173-197): direct extraction is free. */
  def estimateCost(ocrPageCount: Int, directPageCount: Int = 0): CostEstimate = {
    val ocrCost = ocrPageCount * costPerOcrPage
    val ocrTime = ocrPageCount * timePerOcrPage
    val directTime = directPageCount * timePerDirectPage
    CostEstimate(
      ocr_cost_eur = ocrCost,
      direct_cost_eur = 0.0,
      total_cost_eur = ocrCost + 0.0,
      ocr_time_seconds = ocrTime,
      direct_time_seconds = directTime,
      total_time_seconds = ocrTime + directTime)
  }

  /** Strategy matrix (router.py:212-245). */
  def determineStrategy(docType: String, quality: String): String =
    if (quality == Enums.Fast) Enums.DirectOnly
    else if (docType == Enums.PureText) Enums.DirectOnly
    else if (docType == Enums.PureImage) Enums.OcrAll
    else if (docType == Enums.Hybrid) Enums.OcrSelective
    else Enums.DirectOnly

  /** Page selection (router.py:247-283): OCR_SELECTIVE sends image pages
    * to OCR, text pages direct; hybrid pages follow quality (accurate →
    * OCR, balanced → direct); outputs sorted.
    */
  def selectPages(
      classification: Classification,
      strategy: String,
      quality: String): (Vector[Int], Vector[Int]) = {
    val allPages = (1 to classification.total_pages).toVector
    strategy match {
      case Enums.DirectOnly => (allPages, Vector.empty)
      case Enums.OcrAll => (Vector.empty, allPages)
      case _ =>
        var direct = classification.text_pages.toVector
        var ocr = classification.image_pages.toVector
        if (quality == Enums.Accurate) ocr = ocr ++ classification.hybrid_pages
        else direct = direct ++ classification.hybrid_pages
        (direct.sorted, ocr.sorted)
    }
  }

  /** Human-readable reasoning (router.py:285-329); page lists print in
    * Python list syntax `[1, 2]`, lists longer than 5 print as a count.
    */
  def generateReasoning(
      docType: String,
      quality: String,
      strategy: String,
      directPages: Seq[Int],
      ocrPages: Seq[Int]): String = {
    val parts = Vector.newBuilder[String]
    parts += s"PDF type: $docType"
    parts += s"Quality: $quality"
    parts += s"Strategy: $strategy"
    def pyList(xs: Seq[Int]): String = xs.mkString("[", ", ", "]")
    if (directPages.nonEmpty)
      parts += (if (directPages.length <= 5) s"Direct extraction: pages ${pyList(directPages)}"
                else s"Direct extraction: ${directPages.length} pages")
    if (ocrPages.nonEmpty)
      parts += (if (ocrPages.length <= 5) s"OCR extraction: pages ${pyList(ocrPages)}"
                else s"OCR extraction: ${ocrPages.length} pages")
    if (ocrPages.isEmpty) parts += "No OCR required"
    else if (!hasOcrBackend) parts += "(OCR backend unavailable, using direct only)"
    parts.result().mkString(" | ")
  }
}

object Router {
  // Default cost assumptions (router.py:91-93).
  val DefaultCostPerOcrPage = 0.005
  val DefaultTimePerOcrPage = 3.0
  val DefaultTimePerDirectPage = 0.1
  val default = new Router()
}
