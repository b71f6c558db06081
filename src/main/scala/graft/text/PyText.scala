package graft.text

/** Python string-semantics helpers.
  *
  * The reference composes its golden text with Python `str.split()`,
  * `str.strip()` and `"\n\n".join(...)` (reference:
  * src/text_extraction/processor.py:127-129, backends/base.py:33-36).
  * Python's no-arg `split`/`strip` use Python's `str.isspace()` definition
  * of whitespace, which differs from both Java's `Character.isWhitespace`
  * (Python includes U+00A0 NBSP; Java does not) and Java's `\s` regex
  * class. Byte-identical output per url (the per-row invariant) requires
  * reproducing Python's classification exactly, centralised here.
  */
object PyText {

  /** Python `str.isspace()` for a single code point: true for Unicode
    * categories Zs/Zl/Zp plus the bidirectional-WS/B/S controls
    * (\t \n \v \f \r \x1c \x1d \x1e \x1f \x85).
    */
  /** Bitmask of the ASCII Python-whitespace code points — 0x09-0x0d,
    * 0x1c-0x1f, 0x20 — all of which sit below 64, so one shift+mask
    * replaces the 4-comparison chain in the innermost loops.
    */
  private final val AsciiSpaceBits: Long =
    (0x1FL << 9) | (0xFL << 28) | (1L << 32)

  def isPySpace(cp: Int): Boolean = {
    // ASCII fast path — this predicate is the innermost loop of every
    // normalize/word-count/strip pass, and Character.getType per char
    // (previously hit even for the plain space!) dominated it.
    if (cp < 64) return ((AsciiSpaceBits >>> cp) & 1L) != 0L
    if (cp < 0x80) return false
    if (cp == 0x85) return true
    val t = Character.getType(cp)
    t == Character.SPACE_SEPARATOR || t == Character.LINE_SEPARATOR ||
    t == Character.PARAGRAPH_SEPARATOR
  }

  /** Python `str.split()` (no args): split on runs of whitespace, drop
    * empty tokens (leading/trailing whitespace produces nothing).
    */
  def pySplit(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isPySpace(s.codePointAt(i))) i += Character.charCount(s.codePointAt(i))
      if (i < n) {
        val start = i
        while (i < n && !isPySpace(s.codePointAt(i))) i += Character.charCount(s.codePointAt(i))
        out += s.substring(start, i)
      }
    }
    out.result()
  }

  /** `pySplit(s).mkString(" ")` in one pass with no token vector —
    * the segmenter's per-block normalization hot path (accepts a
    * StringBuilder directly so callers skip the toString copy).
    */
  def normalizeSpaces(s: CharSequence): String = {
    val n = s.length
    // Fast path: already-normalized input (no leading/trailing space, no
    // space runs, no non-' ' whitespace) returns without the per-
    // codepoint rebuild — the common case for per-paragraph flushes.
    // Char-wise whitespace detection is surrogate-safe: every Unicode
    // space separator is BMP, and lone surrogate chars type as
    // SURROGATE (non-space) in isPySpace.
    var i = 0
    var clean = n > 0
    var prevSpace = true // a leading space is unclean
    while (clean && i < n) {
      val c = s.charAt(i)
      if (c == ' ') { if (prevSpace) clean = false; prevSpace = true }
      else if (isPySpace(c)) clean = false
      else prevSpace = false
      i += 1
    }
    if (clean && !prevSpace) return s.toString

    val sb = new java.lang.StringBuilder(n)
    i = 0
    var pending = false
    while (i < n) {
      val cp = Character.codePointAt(s, i)
      if (isPySpace(cp)) { if (sb.length > 0) pending = true }
      else {
        if (pending) { sb.append(' '); pending = false }
        sb.appendCodePoint(cp)
      }
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** `normalizeSpaces(s).length` without allocating. */
  def normalizedLength(s: CharSequence): Int = {
    val n = s.length
    var i = 0
    var len = 0
    var pending = false
    while (i < n) {
      val cp = Character.codePointAt(s, i)
      if (isPySpace(cp)) { if (len > 0) pending = true }
      else {
        if (pending) { len += 1; pending = false }
        len += Character.charCount(cp)
      }
      i += Character.charCount(cp)
    }
    len
  }

  /** Python `len(s.split())` — the reference's word count
    * (processor.py:129, backends/base.py:36).
    */
  def wordCount(s: String): Int = {
    // Char-wise (no codePointAt): surrogate-safe — both halves of a
    // pair are non-space, so token runs count identically.
    var count = 0
    var i = 0
    val n = s.length
    var inTok = false
    while (i < n) {
      if (isPySpace(s.charAt(i))) inTok = false
      else if (!inTok) { inTok = true; count += 1 }
      i += 1
    }
    count
  }

  /** Python `str.strip()` (no args). */
  def pyStrip(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && isPySpace(s.codePointAt(a))) a += Character.charCount(s.codePointAt(a))
    while (b > a) {
      val cp = s.codePointBefore(b)
      if (!isPySpace(cp)) return s.substring(a, b)
      b -= Character.charCount(cp)
    }
    s.substring(a, b)
  }

  /** F14: unwrap a ```` ```text ```` fenced block from an LLM OCR
    * response (reference
    * examples/two_pass_ocr_processor_original.py:352-359, 364-371):
    * if the text contains `"```text\n"`, return the slice up to the next
    * `"\n```"` UN-stripped; any other input (no fence, unterminated
    * fence) falls back to `str.strip()` of the whole text.
    */
  def unwrapTextFence(s: String): String = {
    val open = "```text\n"
    val start0 = s.indexOf(open)
    if (start0 >= 0) {
      val start = start0 + open.length
      val end = s.indexOf("\n```", start)
      if (end >= 0) return s.substring(start, end)
    }
    pyStrip(s)
  }

  /** The reference's emptiness gate `if not text.strip()` (processor.py:305). */
  def isBlank(s: String): Boolean = {
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      if (!isPySpace(cp)) return false
      i += Character.charCount(cp)
    }
    true
  }
}
