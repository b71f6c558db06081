package graft.html

import scala.collection.mutable.ArrayBuffer

/** From-scratch streaming HTML tokenizer (north-rule requirement: no
  * jsoup/tika in the environment; see SURVEY.md §7.0). Single forward
  * pass, no backtracking, O(1) state — safe for arbitrarily large crawl
  * payloads inside `mapPartitions`.
  *
  * Supported: start/end tags, attributes (double-/single-/un-quoted and
  * bare), self-closing tags, comments, doctype, CDATA (skipped), raw-text
  * elements (script/style/textarea consumed verbatim until their close
  * tag), character references (named core set + decimal/hex numeric).
  * Unknown/malformed markup degrades to text, never throws.
  */
sealed trait HtmlToken
/** A start tag. CONTRACT: `attrs` is populated only for tag names in the
  * tokenizer's `keepAttrsFor` set — by default ONLY `<img>` (alt text is
  * the single attribute the extraction engine consumes); for every other
  * tag `attrs` is empty even when the markup carries attributes (e.g.
  * `<a href>`), because retaining them would allocate a decoded Map per
  * tag on the hot path. Pass a wider `keepAttrsFor` to
  * `HtmlTokenizer.tokenize` if you need other tags' attributes.
  */
final case class StartTag(name: String, attrs: Map[String, String], selfClosing: Boolean) extends HtmlToken
final case class EndTag(name: String) extends HtmlToken
final case class TextTok(text: String) extends HtmlToken

object HtmlTokenizer {

  private val rawTextTags = Set("script", "style", "textarea")

  private val namedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©",
    "reg" -> "®", "trade" -> "™", "mdash" -> "—",
    "ndash" -> "–", "hellip" -> "…", "laquo" -> "«",
    "raquo" -> "»", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "bull" -> "•",
    "middot" -> "·", "sect" -> "§", "deg" -> "°",
    "euro" -> "€", "pound" -> "£", "yen" -> "¥",
    "cent" -> "¢", "times" -> "×", "divide" -> "÷",
    "szlig" -> "ß", "auml" -> "ä", "ouml" -> "ö",
    "uuml" -> "ü", "Auml" -> "Ä", "Ouml" -> "Ö",
    "Uuml" -> "Ü", "eacute" -> "é", "egrave" -> "è",
    "agrave" -> "à", "ccedil" -> "ç", "shy" -> "­")

  /** Decode character references in a text/attribute slice. */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 12) {
          val body = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (body.startsWith("#x") || body.startsWith("#X"))
              try Some(new String(Character.toChars(Integer.parseInt(body.substring(2), 16))))
              catch { case _: Exception => None }
            else if (body.startsWith("#"))
              try Some(new String(Character.toChars(Integer.parseInt(body.substring(1)))))
              catch { case _: Exception => None }
            else namedEntities.get(body)
          decoded match {
            case Some(d) => sb.append(d); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
    (c >= '0' && c <= '9') || c == '-' || c == '_' || c == ':'

  /** Lower-cased name slice; skips the `toLowerCase` allocation when the
    * slice is already lowercase (the overwhelmingly common case in real
    * markup — this sits on the per-tag hot path).
    */
  private def lowerSlice(s: String, from: Int, until: Int): String = {
    // The fast path must catch ANY uppercase (Character.isUpperCase, not
    // just A-Z): attribute scans are permissive, so names can carry
    // non-ASCII letters whose lowercasing Python's str.lower() performs.
    var k = from
    while (k < until && !Character.isUpperCase(s.charAt(k))) k += 1
    if (k == until) s.substring(from, until)
    else s.substring(from, until).toLowerCase
  }

  /** Tokenize a whole HTML string. Returns a flat token stream (the
    * backing buffer directly — no defensive copy; callers iterate once
    * on the per-document hot path).
    */
  /** Tags whose attributes are retained by default (see StartTag). */
  val DefaultKeepAttrs: Set[String] = Set("img")

  def tokenize(html: String,
      keepAttrsFor: Set[String] = DefaultKeepAttrs): scala.collection.IndexedSeq[HtmlToken] = {
    val out = new ArrayBuffer[HtmlToken](256)
    val n = html.length
    var i = 0
    var textStart = 0

    def flushText(upTo: Int): Unit =
      if (upTo > textStart) out += TextTok(decodeEntities(html.substring(textStart, upTo)))

    while (i < n) {
      // Jump straight to the next '<' with the intrinsified (vectorized)
      // String.indexOf instead of walking text char-by-char — text runs
      // between tags dominate article-like documents, and this scan was
      // the tokenizer's hottest loop. A trailing '<' with nothing after
      // it is text, exactly as in the char-walk version.
      val lt = html.indexOf('<', i)
      if (lt < 0 || lt + 1 >= n) i = n
      else {
        i = lt
        val c1 = html.charAt(i + 1)
        if (c1 == '!') {
          // Comment / doctype / CDATA — skip without emitting.
          flushText(i)
          if (html.startsWith("<!--", i)) {
            val end = html.indexOf("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else if (html.regionMatches(true, i, "<![CDATA[", 0, 9)) {
            val end = html.indexOf("]]>", i + 9)
            i = if (end < 0) n else end + 3
          } else {
            val end = html.indexOf('>', i)
            i = if (end < 0) n else end + 1
          }
          textStart = i
        } else if (c1 == '?') {
          flushText(i)
          val end = html.indexOf('>', i)
          i = if (end < 0) n else end + 1
          textStart = i
        } else if (c1 == '/') {
          flushText(i)
          var j = i + 2
          val nameStart = j
          while (j < n && isNameChar(html.charAt(j))) j += 1
          val name = lowerSlice(html, nameStart, j)
          val end = html.indexOf('>', j)
          if (name.nonEmpty && end >= 0) { out += EndTag(name); i = end + 1 }
          else if (end >= 0) i = end + 1
          else i = n
          textStart = i
        } else if (isNameChar(c1)) {
          flushText(i)
          var j = i + 1
          val nameStart = j
          while (j < n && isNameChar(html.charAt(j))) j += 1
          val name = lowerSlice(html, nameStart, j)
          // Parse attributes until '>'. For tags outside keepAttrsFor
          // the loop runs the identical scanning state machine (quoted
          // values may contain '>') but skips the substring/entity-
          // decode/Map work, which otherwise allocates per
          // <a href>/<div class> on the hot path (contract: StartTag
          // scaladoc).
          val keepAttrs = keepAttrsFor(name)
          var attrs = Map.empty[String, String]
          var selfClosing = false
          var done = false
          var ok = true
          while (!done && j < n) {
            while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
            if (j >= n) { ok = false; done = true }
            else html.charAt(j) match {
              case '>' => j += 1; done = true
              case '/' =>
                if (j + 1 < n && html.charAt(j + 1) == '>') { selfClosing = true; j += 2; done = true }
                else j += 1
              case _ =>
                val aStart = j
                while (j < n && !Character.isWhitespace(html.charAt(j)) &&
                       html.charAt(j) != '=' && html.charAt(j) != '>' && html.charAt(j) != '/') j += 1
                val aEnd = j
                while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
                if (j < n && html.charAt(j) == '=') {
                  j += 1
                  while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
                  if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                    val quote = html.charAt(j); j += 1
                    val vStart = j
                    while (j < n && html.charAt(j) != quote) j += 1
                    if (keepAttrs && aEnd > aStart) {
                      val v = html.substring(vStart, math.min(j, n))
                      attrs += (lowerSlice(html, aStart, aEnd) -> decodeEntities(v))
                    }
                    if (j < n) j += 1
                  } else {
                    val vStart = j
                    while (j < n && !Character.isWhitespace(html.charAt(j)) && html.charAt(j) != '>') j += 1
                    if (keepAttrs && aEnd > aStart)
                      attrs += (lowerSlice(html, aStart, aEnd) ->
                        decodeEntities(html.substring(vStart, j)))
                  }
                } else if (keepAttrs && aEnd > aStart)
                  attrs += (lowerSlice(html, aStart, aEnd) -> "")
            }
          }
          if (ok) {
            out += StartTag(name, attrs, selfClosing)
            i = j
            // Raw-text elements: consume verbatim until the close tag.
            if (!selfClosing && rawTextTags.contains(name)) {
              val close = "</" + name
              val k = indexOfIgnoreCase(html, close, i)
              if (k < 0) i = n
              else {
                val gt = html.indexOf('>', k)
                out += EndTag(name)
                i = if (gt < 0) n else gt + 1
              }
            }
          } else i = n
          textStart = i
        } else { i += 1 } // '<' not opening a construct: plain text
      }
    }
    flushText(n)
    out
  }

  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    val n = hay.length; val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      if (hay.regionMatches(true, i, needle, 0, m)) return i
      i += 1
    }
    -1
  }
}
