package graft.media

/** Header-only image dimension decoders for the formats the reference
  * accepts as upload types (reference backends/base.py:202-209:
  * png/jpg/jpeg/tiff/tif/bmp; gif added for crawl coverage). Pure
  * deterministic byte parsing — no imaging library, no decompression —
  * so the multimodal kernel's decode step is real (true width/height
  * from the container header) while staying sandbox-safe. ~100 bytes of
  * input inspected per image regardless of payload size, which is
  * exactly the at-scale shape: metadata extraction must not read the
  * pixel data.
  *
  * All parsers return None (never throw) on truncated or malformed
  * input — crawl payloads are adversarial.
  */
object ImageHeaders {

  final case class Dims(format: String, width: Int, height: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = (u8(b, i + 1) << 8) | u8(b, i)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i + 3).toLong << 24) | (u8(b, i + 2) << 16) | (u8(b, i + 1) << 8) | u8(b, i)

  /** PNG: 8-byte signature, then the IHDR chunk is REQUIRED first —
    * width/height are the two big-endian u32s at offsets 16/20.
    */
  def png(b: Array[Byte]): Option[Dims] = {
    if (b.length < 24) return None
    val sig = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    var i = 0
    while (i < 8) { if (u8(b, i) != sig(i)) return None; i += 1 }
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = be32(b, 16); val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some(Dims("png", w.toInt, h.toInt))
  }

  /** GIF87a/GIF89a: logical-screen width/height are little-endian u16s
    * at offsets 6/8.
    */
  def gif(b: Array[Byte]): Option[Dims] = {
    if (b.length < 10) return None
    val hdr = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    val w = le16(b, 6); val h = le16(b, 8)
    if (w <= 0 || h <= 0) None else Some(Dims("gif", w, h))
  }

  /** BMP: "BM" magic; BITMAPINFOHEADER (the overwhelmingly common DIB
    * header, size ≥ 40) carries signed little-endian i32 width/height at
    * offsets 18/22; height may be negative (top-down rows).
    */
  def bmp(b: Array[Byte]): Option[Dims] = {
    if (b.length < 26) return None
    if (!(b(0) == 'B' && b(1) == 'M')) return None
    val dibSize = le32(b, 14)
    if (dibSize == 12) { // legacy BITMAPCOREHEADER: u16 fields
      if (b.length < 22) return None
      val w = le16(b, 18); val h = le16(b, 20)
      if (w <= 0 || h <= 0) None else Some(Dims("bmp", w, h))
    } else {
      val w = le32(b, 18).toInt
      val h = math.abs(le32(b, 22).toInt)
      if (w <= 0 || h <= 0) None else Some(Dims("bmp", w, h))
    }
  }

  /** JPEG: walk the marker stream from SOI until a start-of-frame marker
    * (SOF0-SOF15 minus DHT/JPG/DAC, the standard exclusion set); the
    * frame header carries big-endian u16 height then width at offsets
    * +5/+7 from the marker byte. Stops at SOS/EOI or malformed markers.
    */
  def jpeg(b: Array[Byte]): Option[Dims] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None
      var marker = u8(b, i + 1)
      // Skip fill bytes (0xFF padding before a marker).
      while (marker == 0xff && i + 2 < b.length) { i += 1; marker = u8(b, i + 1) }
      if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS before SOF
      if (marker >= 0xd0 && marker <= 0xd7) { i += 2 } // RSTn: no length
      else {
        if (i + 3 >= b.length) return None
        val len = be16(b, i + 2)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (i + 8 >= b.length) return None
          val h = be16(b, i + 5); val w = be16(b, i + 7)
          return if (w <= 0 || h <= 0) None else Some(Dims("jpeg", w, h))
        }
        i += 2 + len
      }
    }
    None
  }

  /** TIFF: classic II/MM header; width/height live in IFD0 tags 256/257
    * (SHORT or LONG). Reads only the first IFD.
    */
  def tiff(b: Array[Byte]): Option[Dims] = {
    if (b.length < 8) return None
    val little = b(0) == 'I' && b(1) == 'I'
    val big = b(0) == 'M' && b(1) == 'M'
    if (!little && !big) return None
    def r16(i: Int) = if (little) le16(b, i) else be16(b, i)
    def r32(i: Int) = if (little) le32(b, i) else be32(b, i)
    if (r16(2) != 42) return None
    val ifd = r32(4)
    if (ifd < 8 || ifd + 2 > b.length) return None
    val n = r16(ifd.toInt)
    var w = -1; var h = -1
    var e = 0
    while (e < n) {
      val off = ifd.toInt + 2 + e * 12
      if (off + 12 > b.length) return None
      val tag = r16(off); val tpe = r16(off + 2)
      val value = if (tpe == 3) r16(off + 8) else r32(off + 8).toInt
      if (tag == 256) w = value
      if (tag == 257) h = value
      e += 1
    }
    if (w <= 0 || h <= 0) None else Some(Dims("tiff", w, h))
  }

  /** Try every known container in magic order. */
  def decode(b: Array[Byte]): Option[Dims] = {
    if (b == null || b.length < 4) return None
    u8(b, 0) match {
      case 0x89 => png(b)
      case 0xff => jpeg(b)
      case 'G' => gif(b)
      case 'B' => bmp(b)
      case 'I' | 'M' => tiff(b)
      case _ => None
    }
  }
}
