package graft.tools

import graft.extract.Processor
import graft.model.Page
import graft.synth.Fixtures
import java.sql.Timestamp

/** Debug CLI: run the extraction kernel on a named fixture family and
  * print the full record. `sbt "runMain graft.tools.ExtractCli <family> [quality]"`.
  */
object ExtractCli {
  def main(args: Array[String]): Unit = {
    val family = args.headOption.getOrElse("text_simple")
    val quality = if (args.length > 1) args(1) else "balanced"
    Fixtures.families.find(_._1 == family) match {
      case None =>
        System.err.println(
          s"unknown family '$family'; one of: ${Fixtures.families.map(_._1).mkString(", ")}")
        sys.exit(2)
      case Some((name, payload)) =>
        val page = Page(s"https://fixtures.example/$name", new Timestamp(0L), payload, "", "en")
        val r = Processor.default.extract(page, quality)
        println(s"url:               ${r.url}")
        println(s"success:           ${r.success}")
        println(s"pdf_type:          ${r.pdf_type}")
        println(s"total_pages:       ${r.total_pages}")
        println(s"quality:           ${r.quality}")
        println(s"extraction_method: ${r.extraction_method}")
        println(s"confidence:        ${r.confidence}")
        println(s"word_count:        ${r.word_count}")
        println(s"text_pages:        ${r.text_pages.mkString(",")}  image_pages: ${r.image_pages.mkString(",")}  hybrid_pages: ${r.hybrid_pages.mkString(",")}")
        println(s"page_errors:       ${r.page_errors}")
        println(s"error:             ${r.error.getOrElse("-")}")
        println("---- text ----")
        println(r.text)
        println("---- end ----")
    }
  }
}
