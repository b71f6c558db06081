package graft.text

/** Text-quality metrics from the reference's eval framework
  * (reference CLAUDE.md:222-235: CER, WER, Jaccard over normalized
  * text). Deterministic Scala kernels. Levenshtein runs the
  * bit-parallel Myers algorithm (Myers 1999, blocked per Hyyrö 2003):
  * O(⌈m/64⌉·n) word operations and O(σ·⌈m/64⌉) memory, ~64× fewer
  * inner-loop steps than the classic DP on document-length inputs.
  * Inputs whose alphabet would blow the bitmask budget (pathological
  * all-distinct word streams) fall back to the two-row DP, which is
  * O(min(m,n)) memory — both paths are exact, so either is safe inside
  * `mapPartitions` on arbitrarily long crawl texts.
  */
object TextEval {

  /** Bitmask budget for the Myers Peq table. The enforced bound on the
    * table is `max(MaxPeqLongs, 64 × blocks)` longs — the 64-symbol
    * floor keeps Myers available for long low-alphabet patterns (where
    * the DP's O(n·m) time would be the real killer), at the price of up
    * to 8 bytes per pattern symbol: 16 MB transient for patterns up to
    * 2 M symbols, growing linearly above that. [MaxPatternBlocks] is
    * the absolute ceiling: patterns past it (~16.7 M symbols, ≥128 MB
    * Peq) always take the DP, so the transient can never exceed 128 MB
    * per pair regardless of input.
    */
  private val MaxPeqLongs = 1 << 21

  /** Hard cap on pattern blocks for the Myers path: 64-symbol floor ×
    * this many blocks = 2^24 longs = 128 MB, the most the Peq table is
    * ever allowed to reach.
    */
  private val MaxPatternBlocks = (1 << 24) / 64

  /** Exact edit distance between two indexed sequences. */
  def levenshtein[T](a: IndexedSeq[T], b: IndexedSeq[T]): Int =
    levenshteinBudgeted(a, b, MaxPeqLongs)

  /** Budget-parameterized entry so specs can force the DP fallback. */
  private[graft] def levenshteinBudgeted[T](
      a: IndexedSeq[T], b: IndexedSeq[T], peqBudget: Int): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    if (a == b) return 0 // skip the scan for the identical case
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    val m = s.length
    val blocks = (m + 63) >>> 6
    if (blocks > MaxPatternBlocks) return levenshteinDp(s, t)

    // Peq: per distinct symbol of the (shorter) pattern, the bitmask of
    // positions holding it. Sized by what the input actually contains;
    // bail to the DP if a huge-alphabet input would exceed the budget
    // (see MaxPeqLongs for the exact enforced bound).
    val maxSymbols = math.max(64, peqBudget / blocks)
    val peq = new java.util.HashMap[T, Array[Long]]()
    var i = 0
    while (i < m) {
      var arr = peq.get(s(i))
      if (arr == null) {
        if (peq.size >= maxSymbols) return levenshteinDp(s, t)
        arr = new Array[Long](blocks)
        peq.put(s(i), arr)
      }
      arr(i >>> 6) |= 1L << (i & 63)
      i += 1
    }

    // Blocked Myers in distance mode: the top boundary row is D[0][j]=j,
    // so every column enters block 0 with a +1 horizontal delta. Each
    // block consumes the carry (hin ∈ {-1,0,+1}) of the one below; the
    // score is tracked at pattern row m — bit (m-1) mod 64 of the last
    // block, read BEFORE the shift. Bits above it in a partial last
    // block stay garbage but are never consulted (the Xh addition only
    // carries low→high, so they cannot influence row m).
    val pv = Array.fill(blocks)(-1L)
    val mv = new Array[Long](blocks)
    val noMatch = new Array[Long](blocks)
    val lastBit = (m - 1) & 63
    var score = m
    var j = 0
    val n = t.length
    while (j < n) {
      val eqArr = {
        val x = peq.get(t(j)); if (x == null) noMatch else x
      }
      var hin = 1
      var blk = 0
      while (blk < blocks) {
        var eq = eqArr(blk)
        val pvb = pv(blk)
        val mvb = mv(blk)
        val xv = eq | mvb
        if (hin < 0) eq |= 1L
        val xh = (((eq & pvb) + pvb) ^ pvb) | eq
        var ph = mvb | ~(xh | pvb)
        var mh = pvb & xh
        if (blk == blocks - 1) {
          if (((ph >>> lastBit) & 1L) != 0L) score += 1
          if (((mh >>> lastBit) & 1L) != 0L) score -= 1
        }
        val hout = (((ph >>> 63) & 1L) - ((mh >>> 63) & 1L)).toInt
        ph <<= 1
        mh <<= 1
        if (hin < 0) mh |= 1L
        if (hin > 0) ph |= 1L
        pv(blk) = mh | ~(xv | ph)
        mv(blk) = ph & xv
        hin = hout
        blk += 1
      }
      j += 1
    }
    score
  }

  /** Classic two-row DP — the fallback for over-budget alphabets and
    * the independent implementation the Myers path is property-tested
    * against.
    */
  private[graft] def levenshteinDp[T](a: IndexedSeq[T], b: IndexedSeq[T]): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
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
