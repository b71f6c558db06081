package graft.text

/** Text-quality metrics from the reference's eval framework
  * (reference CLAUDE.md:222-235: CER, WER, Jaccard over normalized
  * text). Deterministic Scala kernels; two-row DP keeps Levenshtein
  * O(min(m,n)) memory so arbitrarily long crawl texts are safe inside
  * `mapPartitions`.
  */
object TextEval {

  /** Edit distance between two indexed sequences (two-row DP). */
  def levenshtein[T](a: IndexedSeq[T], b: IndexedSeq[T]): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    if (a == b) return 0 // skip the O(n·m) DP for the identical case
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    val m = s.length
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var j = 1
    while (j <= t.length) {
      cur(0) = j
      var i = 1
      while (i <= m) {
        val cost = if (s(i - 1) == t(j - 1)) 0 else 1
        cur(i) = math.min(math.min(cur(i - 1) + 1, prev(i) + 1), prev(i - 1) + cost)
        i += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      j += 1
    }
    prev(m)
  }

  /** Character error rate: edit distance over reference length
    * (reference chars as ground truth; empty ref → 0 if hyp empty else
    * 1, the usual convention).
    */
  def cer(ref: String, hyp: String): Double = {
    if (ref.isEmpty) return if (hyp.isEmpty) 0.0 else 1.0
    levenshtein(ref, hyp).toDouble / ref.length
  }

  /** Word error rate over Python-split tokens (PyText parity). */
  def wer(ref: String, hyp: String): Double = {
    val r = PyText.pySplit(ref)
    val h = PyText.pySplit(hyp)
    if (r.isEmpty) return if (h.isEmpty) 0.0 else 1.0
    levenshtein(r, h).toDouble / r.length
  }

  /** Jaccard over lowercased word sets (reference
    * tests/conftest.py:352-362).
    */
  def jaccardWords(a: String, b: String): Double = {
    val sa = PyText.pySplit(a.toLowerCase).toSet
    val sb = PyText.pySplit(b.toLowerCase).toSet
    if (sa.isEmpty && sb.isEmpty) return 1.0
    val union = (sa ++ sb).size
    if (union == 0) 1.0 else (sa & sb).size.toDouble / union
  }
}
