package graft.text

/** Document fingerprinting: FNV-1a rolling k-gram hashes + winnowing
  * (min-hash per sliding window, as in the MOSS local-fingerprinting
  * scheme). Used for passage-level duplicate detection: two documents
  * sharing fingerprints share (with high probability) a ≥k-char run.
  *
  * Pure Scala kernel (not SQL-expressible — the rolling window is
  * iterative), exposed through the q45 query (DuckDB winnow oracle); deterministic golden
  * values pinned in FingerprintSpec.
  */
object Fingerprint {

  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  /** FNV-1a over the UTF-16 chars of `s[from, from+len)`. */
  def fnv1a(s: CharSequence, from: Int, len: Int): Long = {
    var h = FnvOffset
    var i = 0
    while (i < len) {
      val c = s.charAt(from + i)
      h = (h ^ (c & 0xff)) * FnvPrime
      h = (h ^ ((c >> 8) & 0xff)) * FnvPrime
      i += 1
    }
    h
  }

  /** Lowercase and collapse whitespace runs to single spaces (PyText
    * normalization semantics) so layout doesn't perturb fingerprints.
    */
  def normalize(text: String): String = {
    val sb = new java.lang.StringBuilder(text.length)
    var pendingSpace = false
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (PyText.isPySpace(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(Character.toLowerCase(c))
      }
      i += 1
    }
    sb.toString
  }

  /** Winnowed fingerprints of `text`: hash every k-gram, slide a window
    * of `w` hashes, keep each window's minimum (rightmost on ties —
    * standard winnowing), return distinct selected hashes in document
    * order of first selection.
    */
  def winnow(text: String, k: Int = 8, w: Int = 4): Vector[Long] = {
    val t = normalize(text)
    val n = t.length - k + 1
    if (n <= 0) return Vector.empty
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) { hashes(i) = fnv1a(t, i, k); i += 1 }
    val out = Vector.newBuilder[Long]
    val seen = new java.util.HashSet[java.lang.Long]()
    var lastIdx = -1
    var start = 0
    val effW = math.min(w, n)
    while (start <= n - effW) {
      var minIdx = start
      var j = start + 1
      while (j < start + effW) {
        if (hashes(j) <= hashes(minIdx)) minIdx = j // rightmost min
        j += 1
      }
      if (minIdx != lastIdx) {
        lastIdx = minIdx
        if (seen.add(hashes(minIdx))) out += hashes(minIdx)
      }
      start += 1
    }
    out.result()
  }
}
