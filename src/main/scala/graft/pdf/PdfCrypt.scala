package graft.pdf

import java.security.MessageDigest

/** PDF standard security handler, RC4 subset (ISO 32000-1 §7.6.2-7.6.4,
  * algorithms 2-6): V ∈ {1,2}, R ∈ {2,3}, RC4 string/stream encryption,
  * EMPTY user password — the overwhelmingly common crawl case, where a
  * PDF is "encrypted" only to restrict printing/copying (owner password
  * set, user password empty) and every reader silently decrypts it.
  * AES (V ≥ 4 / R ≥ 4 with AESV2/V3 crypt filters) and real
  * user-password-protected files remain explicit errors.
  *
  * Everything here is the published spec; RC4 itself is the textbook
  * 6-line KSA/PRGA. The reference gets all of this from PyMuPDF
  * (reference/src/text_extraction/processor.py:312 `fitz.open`).
  */
object PdfCrypt {

  /** The 32-byte standard padding string (spec table 3.2 / Algorithm 2). */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + key(i % key.length)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0; var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xff)).toByte
      k += 1
    }
    out
  }

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    parts.foreach(md.update)
    md.digest()
  }

  /** Pad-or-truncate a password to exactly 32 bytes (Algorithm 2 step a). */
  def padPassword(pw: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    val n = math.min(pw.length, 32)
    System.arraycopy(pw, 0, out, 0, n)
    System.arraycopy(Pad, 0, out, n, 32 - n)
    out
  }

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)

  /** Algorithm 2: the file encryption key from the (empty) user
    * password, /O, /P, and the first file ID element.
    */
  def fileKey(userPw: Array[Byte], o: Array[Byte], p: Int, id: Array[Byte],
      r: Int, lengthBits: Int): Array[Byte] = {
    val n = if (r == 2) 5 else lengthBits / 8
    var key = md5(padPassword(userPw), o, le32(p), id).take(n)
    if (r >= 3) {
      var i = 0
      while (i < 50) { key = md5(key).take(n); i += 1 }
    }
    key
  }

  /** Per-object key (Algorithm 1): MD5(fileKey + objnum LE3 + gen LE2),
    * truncated to min(n+5, 16).
    */
  def objKey(fileKey: Array[Byte], num: Int, gen: Int): Array[Byte] = {
    val extra = Array(
      (num & 0xff).toByte, ((num >> 8) & 0xff).toByte, ((num >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
    md5(fileKey, extra).take(math.min(fileKey.length + 5, 16))
  }

  /** Algorithm 3: the /O entry from owner+user passwords. */
  def computeO(ownerPw: Array[Byte], userPw: Array[Byte], r: Int,
      lengthBits: Int): Array[Byte] = {
    val n = if (r == 2) 5 else lengthBits / 8
    var key = md5(padPassword(ownerPw))
    if (r >= 3) { var i = 0; while (i < 50) { key = md5(key); i += 1 } }
    val rc4Key = key.take(n)
    var out = rc4(rc4Key, padPassword(userPw))
    if (r >= 3) {
      var i = 1
      while (i <= 19) {
        out = rc4(rc4Key.map(b => (b ^ i).toByte), out)
        i += 1
      }
    }
    out
  }

  /** Algorithms 4/5: the /U entry from the file key. */
  def computeU(fileKey: Array[Byte], id: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(fileKey, Pad)
    else {
      var out = rc4(fileKey, md5(Pad, id))
      var i = 1
      while (i <= 19) {
        out = rc4(fileKey.map(b => (b ^ i).toByte), out)
        i += 1
      }
      out ++ new Array[Byte](16) // arbitrary 16-byte pad per spec
    }

  /** Algorithm 6: does the EMPTY user password open this file? Returns
    * the file key if so.
    */
  def tryEmptyUserPassword(o: Array[Byte], u: Array[Byte], p: Int,
      id: Array[Byte], r: Int, lengthBits: Int): Option[Array[Byte]] = {
    val key = fileKey(Array.emptyByteArray, o, p, id, r, lengthBits)
    val expect = computeU(key, id, r)
    val cmp = if (r == 2) 32 else 16 // R≥3 compares the first 16 bytes only
    if (u.length >= cmp && expect.take(cmp).sameElements(u.take(cmp))) Some(key)
    else None
  }
}
