package graft.media

/** Structure-level parsers for time-based media containers: WAV/RIFF
  * audio headers and GIF frame walks. Same philosophy as
  * [[ImageHeaders]]: real deterministic byte parsing of the container
  * structure (sample rate, channel layout, frame boundaries) with NO
  * signal decode — at corpus scale, chunking and frame sampling must
  * never touch the encoded payload body, only walk its framing. The
  * pixel/sample decode step itself stays out of scope in this sandbox
  * (no codec libraries); everything these return is honestly derived
  * from container bytes.
  *
  * All parsers return None (never throw) on truncated or malformed
  * input — crawl payloads are adversarial.
  */
object MediaStreams {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = (u8(b, i + 1) << 8) | u8(b, i)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i + 3).toLong << 24) | (u8(b, i + 2) << 16) | (u8(b, i + 1) << 8) | u8(b, i)

  /** WAV audio stream parameters from the RIFF `fmt ` + `data` chunks. */
  final case class WavInfo(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      dataBytes: Long) {
    def byteRate: Long = sampleRate.toLong * channels * (bitsPerSample / 8)
    /** Total duration in milliseconds (floor). */
    def durationMs: Long = if (byteRate <= 0) 0L else dataBytes * 1000L / byteRate
  }

  /** Parse a RIFF/WAVE header: walk the chunk list for `fmt ` (stream
    * parameters) and `data` (payload size — only its SIZE is read, the
    * samples are skipped). Chunks are 8-byte headers + even-padded data,
    * in any order; both must be present.
    */
  def wav(b: Array[Byte]): Option[WavInfo] = {
    if (b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')) return None
    if (!(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None
    var dataBytes = -1L
    while (pos + 8 <= b.length && (fmt.isEmpty || dataBytes < 0)) {
      val id = new String(b, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(b, pos + 4)
      if (size < 0 || size > Int.MaxValue) return None
      val dataStart = pos + 8
      if (id == "fmt ") {
        if (dataStart + 16 > b.length) return None
        val channels = le16(b, dataStart + 2)
        val rate = le32(b, dataStart + 4)
        val bits = le16(b, dataStart + 14)
        if (channels <= 0 || rate <= 0 || rate > Int.MaxValue || bits <= 0 || bits % 8 != 0)
          return None
        fmt = Some((rate.toInt, channels, bits))
      } else if (id == "data") {
        // The data chunk may legally extend to EOF; only its size field
        // is consumed (clamped to the bytes actually present).
        dataBytes = math.min(size, (b.length - dataStart).toLong)
      }
      // Advance in Long space: a declared chunk size near 2^31 (or sizes
      // summing past it) would wrap an Int position negative and read
      // out of bounds. A next position past EOF just ends the walk.
      val next = dataStart.toLong + size + (size & 1L) // chunks are even-padded
      pos = math.min(next, b.length.toLong).toInt
    }
    fmt match {
      case Some((rate, ch, bits)) if dataBytes >= 0 =>
        Some(WavInfo(rate, ch, bits, dataBytes))
      case _ => None
    }
  }

  /** Fixed-duration chunk boundaries for an audio stream: the Spark-side
    * 1→N shape for per-chunk feature extraction (the last chunk may be
    * short). Returns (chunk_index, start_ms, duration_ms) triples.
    */
  def audioChunks(info: WavInfo, chunkMs: Long): Seq[(Int, Long, Long)] = {
    require(chunkMs > 0)
    val total = info.durationMs
    if (total == 0) return Seq.empty
    val n = ((total + chunkMs - 1) / chunkMs).toInt
    (0 until n).map { i =>
      val start = i.toLong * chunkMs
      (i, start, math.min(chunkMs, total - start))
    }
  }

  /** Count GIF frames by walking the real block structure: skip the
    * logical screen descriptor + global color table, then iterate
    * blocks — 0x21 extensions (label + sub-block chain), 0x2C image
    * descriptors (one per frame: 9-byte descriptor, optional local
    * color table, LZW seed byte, sub-block chain), 0x3B trailer. The
    * compressed frame data is SKIPPED via the length-prefixed sub-block
    * chain, never decoded. Returns the frame count; truncated tails
    * yield the frames fully present before the damage.
    */
  def gifFrameCount(b: Array[Byte]): Option[Int] = {
    if (b.length < 13) return None
    val hdr = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    var pos = 13
    val packed = u8(b, 10)
    if ((packed & 0x80) != 0) pos += 3 * (1 << ((packed & 7) + 1)) // global color table
    var frames = 0
    var done = false
    while (!done && pos < b.length) {
      u8(b, pos) match {
        case 0x3b => done = true // trailer
        case 0x21 => // extension: introducer + label, then sub-blocks
          pos += 2
          pos = skipSubBlocks(b, pos)
          if (pos < 0) done = true
        case 0x2c => // image descriptor = one frame
          if (pos + 10 > b.length) { done = true }
          else {
            val ip = u8(b, pos + 9)
            pos += 10
            if ((ip & 0x80) != 0) pos += 3 * (1 << ((ip & 7) + 1)) // local color table
            pos += 1 // LZW minimum code size
            pos = skipSubBlocks(b, pos)
            if (pos < 0) done = true
            else frames += 1
          }
        case _ => done = true // unknown block: stop at the damage point
      }
    }
    Some(frames)
  }

  /** Advance past a length-prefixed sub-block chain (len byte + data,
    * terminated by len 0); -1 if the chain runs off the end.
    */
  private def skipSubBlocks(b: Array[Byte], start: Int): Int = {
    var pos = start
    while (pos < b.length) {
      val len = u8(b, pos)
      if (len == 0) return pos + 1
      pos += 1 + len
    }
    -1
  }

  /** Every-kth frame selection (always includes frame 0): the sampling
    * shape for frame-level feature extraction over video-like payloads.
    */
  def sampleFrames(frameCount: Int, stride: Int): Seq[Int] = {
    require(stride > 0)
    (0 until frameCount by stride).toVector
  }
}
