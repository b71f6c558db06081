package graft

import graft.text.TextEval
import org.scalatest.funsuite.AnyFunSuite

class TextEvalSpec extends AnyFunSuite {

  test("levenshtein: classic cases") {
    assert(TextEval.levenshtein("kitten", "sitting") == 3)
    assert(TextEval.levenshtein("", "abc") == 3)
    assert(TextEval.levenshtein("abc", "") == 3)
    assert(TextEval.levenshtein("abc", "abc") == 0)
    assert(TextEval.levenshtein("flaw", "lawn") == 2)
  }

  test("cer/wer conventions") {
    assert(TextEval.cer("abcd", "abxd") == 0.25)
    assert(TextEval.cer("", "") == 0.0)
    assert(TextEval.cer("", "x") == 1.0)
    assert(TextEval.wer("the quick fox", "the slow fox") == 1.0 / 3)
    assert(TextEval.wer("a  b\tc", "a b c") == 0.0) // Python-split parity
  }

  test("jaccardWords matches reference test-helper semantics") {
    assert(TextEval.jaccardWords("The cat", "the CAT") == 1.0)
    assert(TextEval.jaccardWords("a b", "b c") == 1.0 / 3)
    assert(TextEval.jaccardWords("", "") == 1.0)
  }

  test("x49 eval: identical texts → zero error on pure_text docs") {
    // fast and accurate agree wherever no OCR page exists (pure_text),
    // so the pure_text row must show cer=wer=0, jaccard=1.
    val spark = SparkSuite.shared
    val rows = SparkEntry.queries("x49_eval_quality")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (cer, wer, jac) = rows("pure_text")
    assert(cer == 0.0 && wer == 0.0 && jac == 1.0, s"pure_text: $cer $wer $jac")
    // image/hybrid docs must differ (the OCR path adds text).
    assert(rows.contains("pure_image") && rows("pure_image")._1 > 0.0)
  }
}
