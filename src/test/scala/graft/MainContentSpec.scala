package graft

import graft.extract.MainContent
import graft.model.Page
import graft.synth.Fixtures
import java.sql.Timestamp

/** Unconditional main-content extraction: nav/related/footer stripped
  * from every page regardless of routing class.
  */
class MainContentSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def page(payload: Array[Byte]) =
    Page("u", new Timestamp(0), payload, "", "en")

  test("boilerplate fixture: chrome stripped, content kept") {
    val rec = MainContent.extract(page(Fixtures.boilerplateHtml))
    assert(rec.success && rec.total_pages == 1)
    val t = rec.text
    // Content paragraphs survive…
    assert(t.contains("revenue growth of twelve percent"))
    assert(t.contains("Shares rose four percent"))
    // …chrome does not.
    for (chrome <- Seq("Home", "Sports", "Related:", "About Contact Terms", "Share on FB"))
      assert(!t.contains(chrome), s"chrome leaked: $chrome")
    assert(rec.removed_ratio > 0.1 && rec.removed_ratio < 0.9, rec.removed_ratio)
  }

  test("article generator family: nav/footer links never in main content") {
    val rec = MainContent.extract(page(graft.synth.PageGen.articleHtml(42L, 7L)))
    assert(rec.success)
    for (chrome <- Seq("Archive", "Related one", "About"))
      assert(!rec.text.contains(chrome), s"chrome leaked: $chrome")
    assert(rec.word_count > 20)
  }

  test("corrupted payloads produce error records") {
    val rec = MainContent.extract(page("%PDF-1.4 garbage".getBytes("ISO-8859-1")))
    assert(!rec.success && rec.error.isDefined)
  }

  test("determinism: identical output across calls") {
    val p = page(graft.synth.PageGen.articleHtml(42L, 99L))
    assert(MainContent.extract(p) == MainContent.extract(p))
  }
}
