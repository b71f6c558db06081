package graft.json

import java.util.regex.Pattern

/** JSON-repair cascade — strategy order and rewrite patterns ported from
  * the reference (src/text_extraction/json_repair.py:23-270). Regexes use
  * `(?U)` so `\w`/`\d`/`\s` match Python's unicode-aware classes.
  */
object JsonRepair {

  /** Strategy 1: insert a comma at the error's line/column — after the
    * last non-space/tab character before the column (json_repair.py:78-125).
    */
  def fixMissingCommaAtPosition(text: String, error: PyJson.JsonError): String = {
    val lineNum = error.lineno
    val colNum = error.colno
    val lines = text.split("\n", -1)
    if (lineNum < 1 || lineNum > lines.length) return text
    val lineIdx = lineNum - 1
    val problemLine = lines(lineIdx)
    val insertPos = colNum - 1
    var i = insertPos - 1
    while (i >= 0) {
      if (i < problemLine.length && problemLine.charAt(i) != ' ' && problemLine.charAt(i) != '\t') {
        lines(lineIdx) = problemLine.substring(0, i + 1) + "," + problemLine.substring(i + 1)
        return lines.mkString("\n")
      }
      i -= 1
    }
    if (insertPos <= problemLine.length) {
      lines(lineIdx) = problemLine.substring(0, insertPos) + "," + problemLine.substring(insertPos)
      return lines.mkString("\n")
    }
    text
  }

  // Strategy 2 patterns (json_repair.py:128-175) — note the reference
  // re-indents the following property to 12 spaces; preserved verbatim.
  private val p1 = Pattern.compile("(?U)(\\})\\s*\\n\\s*(\"[\\w_]+\"\\s*:)")
  private val p2 = Pattern.compile("(?U)(\\])\\s*\\n\\s*(\"[\\w_]+\"\\s*:)")
  private val p3 = Pattern.compile("(?U)(\"\\w+\")\\s*\\n\\s*(\"[\\w_]+\"\\s*:)")
  private val p4 = Pattern.compile("(?U)(\\d+)\\s*\\n\\s*(\"[\\w_]+\"\\s*:)")
  private val p5 = Pattern.compile("(?U)\\b(true|false|null)\\b\\s*\\n\\s*(\"[\\w_]+\"\\s*:)")

  def fixMissingCommasPattern(text: String): String = {
    var t = text
    val repl = "$1,\n            $2"
    t = p1.matcher(t).replaceAll(repl)
    t = p2.matcher(t).replaceAll(repl)
    t = p3.matcher(t).replaceAll(repl)
    t = p4.matcher(t).replaceAll(repl)
    t = p5.matcher(t).replaceAll(repl)
    t
  }

  // Strategy 3 (json_repair.py:178-190).
  private val trailingBrace = Pattern.compile("(?U),\\s*\\}")
  private val trailingBracket = Pattern.compile("(?U),\\s*\\]")

  def removeTrailingCommas(text: String): String = {
    var t = trailingBrace.matcher(text).replaceAll("}")
    t = trailingBracket.matcher(t).replaceAll("]")
    t
  }

  /** Strategy 4 is a conservative stub in the reference
    * (json_repair.py:193-202) — kept as a no-op for parity.
    */
  def fixUnescapedQuotes(text: String): String = text

  /** Repair cascade (json_repair.py:23-75): each strategy is applied to
    * the ORIGINAL text; the first whose output parses wins.
    */
  def repairJsonText(text: String, error: Option[PyJson.JsonError]): String = {
    error match {
      case Some(e) if e.getMessage.contains("Expecting ',' delimiter") =>
        val fixed = fixMissingCommaAtPosition(text, e)
        if (PyJson.isValid(fixed)) return fixed
      case _ =>
    }
    val s2 = fixMissingCommasPattern(text)
    if (PyJson.isValid(s2)) return s2
    val s3 = removeTrailingCommas(text)
    if (PyJson.isValid(s3)) return s3
    val s4 = fixUnescapedQuotes(text)
    if (PyJson.isValid(s4)) return s4
    text
  }

  /** `safe_json_parse` (json_repair.py:205-240): parse, repair on
    * failure; raises/propagates the ORIGINAL error if repair fails.
    * Returns (value, wasRepaired) on success, Left(original error)
    * otherwise.
    */
  def safeJsonParse(text: String, attemptRepair: Boolean = true): Either[PyJson.JsonError, (PyJson.JVal, Boolean)] =
    PyJson.parse(text) match {
      case Right(v) => Right((v, false))
      case Left(e) if !attemptRepair => Left(e)
      case Left(e) =>
        val repaired = repairJsonText(text, Some(e))
        PyJson.parse(repaired) match {
          case Right(v) => Right((v, true))
          case Left(_) => Left(e) // original error, not the repair error
        }
    }

  /** Invoice-structure validation (json_repair.py:243-270). */
  def validateInvoiceJsonStructure(data: PyJson.JVal): Boolean = data match {
    case PyJson.JObj(m) =>
      val requiredKeys = Seq("supplier", "amounts", "document_flags", "line_items")
      requiredKeys.forall(m.contains) && (m("line_items") match {
        case PyJson.JArr(_) => true
        case _ => false
      })
    case _ => false
  }

  /** SQL-surface summary used by the `f11_json_repair` query: parse
    * status + repair flag as plain columns.
    */
  def repairStatus(text: String): (Boolean, Boolean) =
    safeJsonParse(text) match {
      case Right((_, repaired)) => (true, repaired)
      case Left(_) => (false, false)
    }
}
