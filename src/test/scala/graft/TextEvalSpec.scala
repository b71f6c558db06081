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

  test("levenshtein: Myers bit-parallel == two-row DP (property)") {
    val rnd = new scala.util.Random(49)
    // Strings over alphabets of 2 / 4 / 26 symbols, lengths crossing the
    // 64-bit block boundaries (0..200 covers 1-, 2- and 3-block patterns
    // plus the exact 63/64/65 edges via targeted cases below).
    for (_ <- 1 to 300) {
      val sigma = Seq(2, 4, 26)(rnd.nextInt(3))
      def mk(n: Int) = Array.fill(n)(('a' + rnd.nextInt(sigma)).toChar).mkString
      val (a, b) = (mk(rnd.nextInt(200)), mk(rnd.nextInt(200)))
      assert(TextEval.levenshtein(a, b) == TextEval.levenshteinDp[Char](a, b),
        s"mismatch on a=$a b=$b")
    }
    // Block edges: pattern lengths 63, 64, 65, 127, 128, 129.
    for (m <- Seq(63, 64, 65, 127, 128, 129); n <- Seq(1, 64, 130)) {
      val a = Array.tabulate(m)(i => ('a' + i % 3).toChar).mkString
      val b = Array.tabulate(n)(i => ('a' + (i + 1) % 3).toChar).mkString
      assert(TextEval.levenshtein(a, b) == TextEval.levenshteinDp[Char](a, b),
        s"mismatch at m=$m n=$n")
    }
    // Word sequences (the WER shape: T = String).
    for (_ <- 1 to 100) {
      def mkw(n: Int) = IndexedSeq.fill(n)("w" + rnd.nextInt(8))
      val (a, b) = (mkw(rnd.nextInt(120)), mkw(rnd.nextInt(120)))
      assert(TextEval.levenshtein(a, b) == TextEval.levenshteinDp(a, b))
    }
  }

  test("levenshtein: over-budget alphabet falls back to the DP, same result") {
    val rnd = new scala.util.Random(94)
    for (_ <- 1 to 50) {
      // All-distinct word streams maximize the alphabet; a 64-long budget
      // forces the fallback (maxSymbols floors at 64, lengths go past it).
      def mkw(n: Int) = IndexedSeq.tabulate(n)(i => s"u${i}_${rnd.nextInt(4)}")
      val (a, b) = (mkw(70 + rnd.nextInt(60)), mkw(70 + rnd.nextInt(60)))
      val viaBudget = TextEval.levenshteinBudgeted(a, b, 1)
      assert(viaBudget == TextEval.levenshteinDp(a, b))
      assert(viaBudget == TextEval.levenshtein(a, b)) // un-budgeted Myers agrees
    }
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

  test("kernel eval: fast == accurate on pure_text docs, differs on image docs") {
    // fast and accurate agree wherever no OCR page exists (pure_text),
    // so that class must eval to cer=wer=0, jaccard=1 (the reference A9
    // roll-up; formerly the x49 driver query, now pinned here directly).
    val proc = graft.extract.Processor.default
    val rows = graft.synth.PageGen.generate(SparkSuite.shared, 400)
      .collect().map { p =>
        val ref = proc.extract(p, "accurate")
        val hyp = proc.extract(p, "fast")
        ref.pdf_type -> (TextEval.cer(ref.text, hyp.text),
          TextEval.wer(ref.text, hyp.text),
          TextEval.jaccardWords(ref.text, hyp.text))
      }
    val pureText = rows.filter(_._1 == "pure_text").map(_._2)
    assert(pureText.nonEmpty)
    assert(pureText.forall { case (c, w, j) => c == 0.0 && w == 0.0 && j == 1.0 })
    // image docs must differ (the OCR path adds text).
    val img = rows.filter(_._1 == "pure_image").map(_._2)
    assert(img.nonEmpty && img.exists(_._1 > 0.0))
  }

  test("q49 eval query: per-variant metric invariants") {
    val spark = SparkSuite.shared
    val rows = SparkEntry.queries("q49_eval_quality")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[String]("variant"), r.getAs[Double]("cer"),
        r.getAs[Double]("wer"), r.getAs[Double]("jaccard")))
    assert(rows.nonEmpty)
    val byVariant = rows.groupBy(_._1)
    assert(byVariant.keySet ==
      Set("identical", "char_dropped", "case_folded", "word_reversed"))
    // identical: all three metrics trivial.
    assert(byVariant("identical").forall { case (_, c, w, j) => c == 0.0 && w == 0.0 && j == 1.0 })
    // char_dropped: dropping 'e' must cost character edits somewhere.
    assert(byVariant("char_dropped").exists(_._2 > 0.0))
    // case_folded: word SETS are case-insensitive → jaccard exactly 1;
    // cased words differ char-wise → cer > 0 somewhere.
    assert(byVariant("case_folded").forall(_._4 == 1.0))
    assert(byVariant("case_folded").exists(_._2 > 0.0))
    // word_reversed: same word multiset → jaccard exactly 1; order
    // changes → wer > 0 somewhere.
    assert(byVariant("word_reversed").forall(_._4 == 1.0))
    assert(byVariant("word_reversed").exists(_._3 > 0.0))
  }
}
