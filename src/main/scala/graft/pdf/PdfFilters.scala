package graft.pdf

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, Inflater}

/** PDF stream filters — decode side used by `PdfParser` on real-world
  * shapes (filter chains, /DecodeParms predictors), encode side used by
  * `PdfWriter` to synthesize fixtures for every decoder (co-evolved
  * writer/parser, SURVEY.md §5.2). Covers the non-image filters of the
  * PDF spec: Flate, LZW (the TIFF-variant LZW with EarlyChange),
  * ASCIIHex, ASCII85, RunLength, plus the PNG predictors (up/sub/avg/
  * paeth) that xref streams conventionally apply under Flate.
  *
  * The reference gets all of this from PyMuPDF
  * (src/text_extraction/processor.py:312); here it is explicit, bounded
  * (64 MB inflated cap per stream) and never throws — malformed crawl
  * PDFs must degrade to empty output, not task failures.
  */
object PdfFilters {

  val MaxDecoded: Int = 64 << 20

  // ---- Flate ------------------------------------------------------------

  // One Inflater per thread, reset per stream: modern-layout PDFs
  // decode several flate streams per document (xref stream + ObjStm +
  // content), and the native zlib alloc/free of a fresh Inflater per
  // stream was a measurable share of per-PDF cost. Never end()ed —
  // thread-local lifetime matches the executor thread.
  private val inflaterTL: ThreadLocal[Inflater] =
    ThreadLocal.withInitial(() => new Inflater())

  def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = inflaterTL.get()
    inf.reset()
    inf.setInput(data)
    val out = new ByteArrayOutputStream(math.min(data.length * 4 + 64, 1 << 20))
    val buf = new Array[Byte](8192)
    try {
      val maxIters = 1 << 20
      var guard = 0
      while (!inf.finished() && guard < maxIters && out.size() < MaxDecoded) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) guard = maxIters // truncated
        else out.write(buf, 0, n)
        guard += 1
      }
    } catch { case _: Exception => /* partial output is fine */ }
    out.toByteArray
  }

  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  // ---- ASCIIHex ----------------------------------------------------------

  def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length / 2 + 8)
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      val v =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else if (c == '>') { done = true; -1 }
        else -1 // whitespace / junk skipped
      if (v >= 0) {
        if (hi < 0) hi = v
        else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4) // odd final digit: low nibble = 0
    out.toByteArray
  }

  def asciiHexEncode(data: Array[Byte]): Array[Byte] = {
    val sb = new java.lang.StringBuilder(data.length * 2 + 2)
    var i = 0
    while (i < data.length) {
      sb.append(f"${data(i) & 0xff}%02X")
      if (i % 32 == 31) sb.append('\n')
      i += 1
    }
    sb.append('>')
    sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  // ---- ASCII85 -----------------------------------------------------------

  def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 4 / 5 + 8)
    val grp = new Array[Int](5)
    var k = 0
    var i = 0
    var done = false
    // Optional <~ prefix.
    if (data.length >= 2 && data(0) == '<' && data(1) == '~') i = 2
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '~') done = true
      else if (c == 'z' && k == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
      else if (c >= '!' && c <= 'u') {
        grp(k) = c - '!'; k += 1
        if (k == 5) {
          var v = 0L
          var j = 0
          while (j < 5) { v = v * 85 + grp(j); j += 1 }
          out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
          out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
          k = 0
        }
      } // whitespace and junk skipped
      i += 1
    }
    if (k > 0) { // partial final group: pad with 'u', emit k-1 bytes
      var j = k
      while (j < 5) { grp(j) = 84; j += 1 }
      var v = 0L
      j = 0
      while (j < 5) { v = v * 85 + grp(j); j += 1 }
      val bytes = Array(((v >> 24) & 0xff).toInt, ((v >> 16) & 0xff).toInt,
        ((v >> 8) & 0xff).toInt, (v & 0xff).toInt)
      var b = 0
      while (b < k - 1) { out.write(bytes(b)); b += 1 }
    }
    out.toByteArray
  }

  def ascii85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new java.lang.StringBuilder(data.length * 5 / 4 + 8)
    var i = 0
    while (i < data.length) {
      val rem = math.min(4, data.length - i)
      var v = 0L
      var j = 0
      while (j < 4) {
        v = (v << 8) | (if (j < rem) data(i + j) & 0xff else 0)
        j += 1
      }
      if (rem == 4 && v == 0) sb.append('z')
      else {
        val cs = new Array[Char](5)
        var k = 4
        while (k >= 0) { cs(k) = ('!' + (v % 85).toInt).toChar; v /= 85; k -= 1 }
        var c = 0
        while (c < rem + 1) { sb.append(cs(c)); c += 1 }
      }
      if (i % 60 == 56) sb.append('\n')
      i += 4
    }
    sb.append("~>")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  // ---- RunLength ---------------------------------------------------------

  def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 2 + 8)
    var i = 0
    var done = false
    while (i < data.length && !done && out.size() < MaxDecoded) {
      val len = data(i) & 0xff
      if (len == 128) done = true
      else if (len < 128) {
        val n = math.min(len + 1, data.length - i - 1)
        out.write(data, i + 1, n)
        i += len + 2
      } else {
        if (i + 1 < data.length) {
          val b = data(i + 1)
          var r = 0
          while (r < 257 - len) { out.write(b); r += 1 }
        }
        i += 2
      }
    }
    out.toByteArray
  }

  def runLengthEncode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + data.length / 128 + 8)
    var i = 0
    while (i < data.length) {
      // Count a run.
      var run = 1
      while (i + run < data.length && run < 128 && data(i + run) == data(i)) run += 1
      if (run >= 2) {
        out.write(257 - run); out.write(data(i))
        i += run
      } else {
        // Literal stretch until the next run of ≥3 (or 128 bytes).
        var lit = 1
        while (i + lit < data.length && lit < 128 &&
               !(i + lit + 2 < data.length && data(i + lit) == data(i + lit + 1) &&
                 data(i + lit) == data(i + lit + 2))) lit += 1
        out.write(lit - 1)
        out.write(data, i, lit)
        i += lit
      }
    }
    out.write(128)
    out.toByteArray
  }

  // ---- LZW (PDF/TIFF variant: 9→12-bit codes, clear=256, EOD=257, ----
  // ---- EarlyChange=1 by default) -------------------------------------

  def lzwDecode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 3 + 16)
    val Clear = 256; val Eod = 257
    var dictSize = 258
    var codeLen = 9
    // Dictionary: code → byte sequence; first 256 are single bytes.
    val dict = new scala.collection.mutable.ArrayBuffer[Array[Byte]](4096)
    def resetDict(): Unit = {
      dict.clear()
      var b = 0
      while (b < 256) { dict += Array(b.toByte); b += 1 }
      dict += Array.emptyByteArray // 256 clear
      dict += Array.emptyByteArray // 257 eod
      dictSize = 258
      codeLen = 9
    }
    resetDict()
    var bitBuf = 0L
    var bitCnt = 0
    var prev: Array[Byte] = null
    var i = 0
    var done = false
    while (!done && out.size() < MaxDecoded) {
      while (bitCnt < codeLen && i < data.length) {
        bitBuf = (bitBuf << 8) | (data(i) & 0xff); bitCnt += 8; i += 1
      }
      if (bitCnt < codeLen) done = true
      else {
        val code = ((bitBuf >> (bitCnt - codeLen)) & ((1 << codeLen) - 1)).toInt
        bitCnt -= codeLen
        if (code == Eod) done = true
        else if (code == Clear) { resetDict(); prev = null }
        else {
          val entry: Array[Byte] =
            if (code < dictSize) dict(code) // 256/257 handled above
            else if (code == dictSize && prev != null) prev :+ prev(0) // KwKwK
            else { done = true; Array.emptyByteArray } // corrupt code
          if (!done) {
            out.write(entry, 0, entry.length)
            if (prev != null && dictSize < 4096) {
              dict += (prev :+ entry(0))
              dictSize += 1
            }
            // Code length grows when the NEXT code would overflow
            // (EarlyChange shifts the boundary by one).
            if (dictSize + earlyChange >= (1 << codeLen) && codeLen < 12) codeLen += 1
            prev = entry
          }
        }
      }
    }
    out.toByteArray
  }

  def lzwEncode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + 16)
    val Clear = 256; val Eod = 257
    var bitBuf = 0L
    var bitCnt = 0
    def put(code: Int, len: Int): Unit = {
      bitBuf = (bitBuf << len) | code; bitCnt += len
      while (bitCnt >= 8) {
        out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8
      }
    }
    val dict = scala.collection.mutable.HashMap[scala.collection.immutable.ArraySeq[Byte], Int]()
    def resetDict(): Int = {
      dict.clear()
      var b = 0
      while (b < 256) { dict(scala.collection.immutable.ArraySeq(b.toByte)) = b; b += 1 }
      258
    }
    var dictSize = resetDict()
    var codeLen = 9
    put(Clear, codeLen)
    var i = 0
    var w = scala.collection.immutable.ArraySeq.empty[Byte]
    while (i < data.length) {
      val wk = w :+ data(i)
      if (dict.contains(wk)) w = wk
      else {
        put(dict(w), codeLen)
        dict(wk) = dictSize
        dictSize += 1
        if (dictSize + earlyChange - 1 >= (1 << codeLen) && codeLen < 12) codeLen += 1
        if (dictSize >= 4095) { // reset before overflow
          put(Clear, codeLen)
          dictSize = resetDict()
          codeLen = 9
        }
        w = scala.collection.immutable.ArraySeq(data(i))
      }
      i += 1
    }
    if (w.nonEmpty) put(dict(w), codeLen)
    put(Eod, codeLen)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  // ---- PNG predictors (DecodeParms /Predictor >= 10) ----------------------

  /** Undo per-row PNG prediction: each row is [filterType | bytes]. */
  /** TIFF Predictor 2 (horizontal differencing): each sample stores
    * the delta from the sample one pixel to its left; decoding adds the
    * previous pixel's component back, row by row. Only the 8-bit
    * component case is differenced bytewise per spec; other depths pass
    * through unchanged (rare in crawl PDFs, and a wrong un-difference
    * is worse than none).
    */
  def tiffUnpredict(data: Array[Byte], columns: Int, colors: Int = 1,
      bitsPerComponent: Int = 8): Array[Byte] = {
    if (bitsPerComponent != 8) return data
    val rowLen = columns * colors
    if (rowLen <= 0 || data.length < rowLen) return data
    val out = data.clone()
    var row = 0
    val nRows = data.length / rowLen
    while (row < nRows) {
      val base = row * rowLen
      var i = colors
      while (i < rowLen) {
        out(base + i) = (out(base + i) + out(base + i - colors)).toByte
        i += 1
      }
      row += 1
    }
    out
  }

  def pngUnpredict(data: Array[Byte], columns: Int, colors: Int = 1,
      bitsPerComponent: Int = 8): Array[Byte] = {
    val bpp = math.max(1, colors * bitsPerComponent / 8)
    val rowLen = (columns * colors * bitsPerComponent + 7) / 8
    if (rowLen <= 0 || data.length < rowLen + 1) return data
    val nRows = data.length / (rowLen + 1)
    val out = new Array[Byte](nRows * rowLen)
    var r = 0
    while (r < nRows) {
      val ft = data(r * (rowLen + 1)) & 0xff
      val src = r * (rowLen + 1) + 1
      val dst = r * rowLen
      var c = 0
      while (c < rowLen) {
        val raw = data(src + c) & 0xff
        val left = if (c >= bpp) out(dst + c - bpp) & 0xff else 0
        val up = if (r > 0) out(dst - rowLen + c) & 0xff else 0
        val ul = if (r > 0 && c >= bpp) out(dst - rowLen + c - bpp) & 0xff else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + ((left + up) / 2)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => raw
        }
        out(dst + c) = (v & 0xff).toByte
        c += 1
      }
      r += 1
    }
    out
  }

  /** Apply PNG "up" prediction (type 2) — the conventional choice for
    * xref streams; exercises the unpredictor from the encode side.
    */
  def pngPredictUp(data: Array[Byte], columns: Int): Array[Byte] = {
    val rowLen = columns
    val nRows = (data.length + rowLen - 1) / rowLen
    val out = new ByteArrayOutputStream(data.length + nRows + 8)
    var r = 0
    while (r < nRows) {
      out.write(2) // filter type: up
      var c = 0
      while (c < rowLen) {
        val idx = r * rowLen + c
        val cur = if (idx < data.length) data(idx) & 0xff else 0
        val up = if (r > 0) data((r - 1) * rowLen + c) & 0xff else 0
        out.write((cur - up) & 0xff)
        c += 1
      }
      r += 1
    }
    out.toByteArray
  }
}
