package graft

import graft.text.Charsets
import java.nio.charset.{Charset, StandardCharsets}
import org.scalatest.funsuite.AnyFunSuite

class CharsetsSpec extends AnyFunSuite {

  private val cp1252 = Charset.forName("windows-1252")
  private val sjis = Charset.forName("Shift_JIS")

  test("label mapping: WHATWG aliases, unknown labels, quoting") {
    assert(Charsets.forLabel("UTF-8").contains(StandardCharsets.UTF_8))
    assert(Charsets.forLabel("utf8").contains(StandardCharsets.UTF_8))
    // WHATWG: latin1 / iso-8859-1 / ascii all mean windows-1252.
    assert(Charsets.forLabel("ISO-8859-1").contains(cp1252))
    assert(Charsets.forLabel("latin1").contains(cp1252))
    assert(Charsets.forLabel("us-ascii").contains(cp1252))
    assert(Charsets.forLabel("Shift_JIS").contains(sjis))
    assert(Charsets.forLabel("shift-jis").contains(sjis))
    assert(Charsets.forLabel("windows-1251").map(_.name).contains("windows-1251"))
    assert(Charsets.forLabel("\"utf-8\"").contains(StandardCharsets.UTF_8))
    assert(Charsets.forLabel("no-such-charset-xyz").isEmpty)
    assert(Charsets.forLabel("").isEmpty)
  }

  test("BOM beats meta beats fallback") {
    val metaCp = "<html><head><meta charset=\"windows-1252\"></head></html>".getBytes(cp1252)
    assert(Charsets.sniff(metaCp) == cp1252)
    // BOM wins over a contradicting meta.
    val bommed = Array(0xef, 0xbb, 0xbf).map(_.toByte) ++ metaCp
    assert(Charsets.sniff(bommed) == StandardCharsets.UTF_8)
    // Transport wins over meta.
    assert(Charsets.sniff(metaCp, Some("shift_jis")) == sjis)
    // Nothing declared → UTF-8.
    assert(Charsets.sniff("<html>x</html>".getBytes(StandardCharsets.UTF_8)) == StandardCharsets.UTF_8)
  }

  test("meta sniffing: both syntaxes, only within the first 1024 bytes") {
    val httpEquiv = ("<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=shift_jis\"></head><body>x</body></html>").getBytes(StandardCharsets.US_ASCII)
    assert(Charsets.sniff(httpEquiv) == sjis)
    val farMeta = ("<html><head>" + ("<!-- pad -->" * 100) +
      "<meta charset=\"shift_jis\"></head></html>").getBytes(StandardCharsets.US_ASCII)
    assert(Charsets.sniff(farMeta) == StandardCharsets.UTF_8) // beyond 1024: not seen
  }

  test("decode: byte-correct round trips for cp1252 and Shift_JIS") {
    val german = "Straßenmaß über Gebühr — äöüß École."
    val bytes1252 = s"""<html><head><meta charset=windows-1252></head><body><p>$german</p></body></html>"""
      .getBytes(cp1252)
    assert(Charsets.decode(bytes1252).contains(german))
    val jp = "日本語のテスト文です。"
    val bytesSjis = s"""<html><head><meta charset=shift_jis></head><body><p>$jp</p></body></html>"""
      .getBytes(sjis)
    assert(Charsets.decode(bytesSjis).contains(jp))
    // The same bytes decoded as UTF-8 would be mojibake — prove the sniff matters.
    assert(!new String(bytes1252, StandardCharsets.UTF_8).contains(german))
    assert(!new String(bytesSjis, StandardCharsets.UTF_8).contains(jp))
  }

  test("decode drops the BOM; UTF-16 BOMs honored") {
    val utf8Bom = Array(0xef, 0xbb, 0xbf).map(_.toByte) ++ "<p>ü</p>".getBytes(StandardCharsets.UTF_8)
    assert(Charsets.decode(utf8Bom) == "<p>ü</p>")
    val utf16le = Array(0xff, 0xfe).map(_.toByte) ++ "<p>ü</p>".getBytes(StandardCharsets.UTF_16LE)
    assert(Charsets.decode(utf16le) == "<p>ü</p>")
    val utf16be = Array(0xfe, 0xff).map(_.toByte) ++ "<p>ü</p>".getBytes(StandardCharsets.UTF_16BE)
    assert(Charsets.decode(utf16be) == "<p>ü</p>")
  }

  test("a meta-declared utf-16 label maps to UTF-8 (WHATWG prescan rule)") {
    // If the meta tag is readable by an ASCII byte scan, the content is
    // not UTF-16 — the label is an authoring lie the spec maps to UTF-8.
    val page = """<html><head><meta charset="utf-16"></head><body>héllo</body></html>"""
      .getBytes("UTF-8")
    assert(graft.text.Charsets.sniff(page, None) == java.nio.charset.StandardCharsets.UTF_8)
    assert(graft.text.Charsets.decode(page).contains("héllo"))
    // A real UTF-16 BOM still wins as UTF-16.
    val bom = Array(0xff.toByte, 0xfe.toByte) ++ "hi".getBytes("UTF-16LE")
    assert(graft.text.Charsets.decode(bom) == "hi")
  }

  test("adversarial: junk labels and malformed bytes never throw") {
    assert(Charsets.decode(null) == "")
    assert(Charsets.decode(Array.emptyByteArray) == "")
    Charsets.decode("<meta charset=totally-bogus-enc><p>x</p>".getBytes(StandardCharsets.UTF_8))
    // Invalid UTF-8 sequences decode with replacement, not exceptions.
    val bad = Array(0xc3, 0x28, 0xa0, 0xa1).map(_.toByte)
    Charsets.decode(bad)
    val rnd = new scala.util.Random(77)
    (1 to 300).foreach { _ =>
      Charsets.decode(Array.fill[Byte](rnd.nextInt(60))(rnd.nextInt().toByte))
    }
  }

  test("PageGen encoding variants extract clean text through the kernel") {
    import graft.synth.PageGen
    // Find content ids for each variant deterministically.
    val cp = (0L to 4000L).find(id => PageGen.contentId(42L, id) == id &&
      PageGen.familyFor(42L, id) == "article" && PageGen.encodingVariant(42L, id) == 0).get
    val sj = (0L to 4000L).find(id => PageGen.contentId(42L, id) == id &&
      PageGen.familyFor(42L, id) == "article" && PageGen.encodingVariant(42L, id) == 1).get
    val proc = graft.extract.Processor.default
    val rCp = proc.extract(PageGen.row(42L, cp), "accurate")
    assert(rCp.success && rCp.text.contains(PageGen.Cp1252Sentence),
      s"cp1252 variant id=$cp text=${rCp.text.take(200)}")
    assert(!rCp.text.contains("�"))
    val rSj = proc.extract(PageGen.row(42L, sj), "accurate")
    assert(rSj.success && rSj.text.contains(PageGen.SjisSentence),
      s"sjis variant id=$sj text=${rSj.text.take(200)}")
    assert(!rSj.text.contains("�"))
  }
}
