package graft

import graft.media.{MediaGen, MediaStreams}
import org.scalatest.funsuite.AnyFunSuite

/** MediaStreams: WAV/RIFF header walk + GIF frame walk against the
  * co-evolved MediaGen writers, plus adversarial truncation fuzz (the
  * parsers must never throw on crawl bytes).
  */
class MediaStreamsSpec extends AnyFunSuite {

  test("wav round-trip: stream params and duration survive the writer") {
    val b = MediaGen.wav(sampleRate = 16000, channels = 2, bits = 8, durationMs = 1500)
    val info = MediaStreams.wav(b).get
    assert(info.sampleRate == 16000)
    assert(info.channels == 2)
    assert(info.bitsPerSample == 8)
    assert(info.byteRate == 32000L)
    assert(info.durationMs == 1500L)
  }

  test("wav rejects non-RIFF, non-WAVE, and truncated input without throwing") {
    assert(MediaStreams.wav("not a wav at all".getBytes).isEmpty)
    assert(MediaStreams.wav(Array.emptyByteArray).isEmpty)
    val good = MediaGen.wav(8000, 1, 8, 1000)
    // Every truncation point: parse returns None or a clamped duration,
    // never throws.
    (0 until good.length by 7).foreach { cut =>
      MediaStreams.wav(good.take(cut)) // must not throw
    }
    // Truncated data chunk → duration clamps to bytes actually present.
    val half = good.take(44 + (good.length - 44) / 2)
    val info = MediaStreams.wav(half).get
    assert(info.durationMs <= 1000L && info.durationMs >= 400L)
  }

  test("wav chunk walk survives declared sizes near 2^31 without wrapping negative") {
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    // A JUNK chunk declaring ~2^31 bytes: the old Int walk wrapped
    // `pos` negative and threw StringIndexOutOfBoundsException.
    val huge = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ le32(0x7ffffff0L) ++ Array.fill[Byte](16)(0)
    assert(MediaStreams.wav(huge).isEmpty) // must not throw
    // Two chunks whose sizes SUM past 2^31 — same wrap class.
    val summed = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ le32(0x40000000L) ++ Array.fill[Byte](8)(0) ++
      "JUNK".getBytes ++ le32(0x40000000L) ++ Array.fill[Byte](8)(0)
    assert(MediaStreams.wav(summed).isEmpty) // must not throw
    // fmt+data found BEFORE a huge trailing chunk still parses.
    val good = MediaGen.wav(8000, 1, 8, 200)
    val trailing = good ++ "JUNK".getBytes ++ le32(0x7ffffff0L)
    assert(MediaStreams.wav(trailing).exists(_.sampleRate == 8000))
  }

  test("audio chunk boundaries tile the stream exactly") {
    val info = MediaStreams.WavInfo(8000, 1, 8, dataBytes = 8000L * 1300 / 1000)
    assert(info.durationMs == 1300L)
    val chunks = MediaStreams.audioChunks(info, 500L)
    assert(chunks == Seq((0, 0L, 500L), (1, 500L, 500L), (2, 1000L, 300L)))
    assert(chunks.map(_._3).sum == info.durationMs)
    assert(MediaStreams.audioChunks(MediaStreams.WavInfo(8000, 1, 8, 0), 500L).isEmpty)
  }

  test("gif frame count round-trips the animated writer across 1..40 frames") {
    Seq(1, 2, 7, 32, 40).foreach { n =>
      val b = MediaGen.gifAnimated(64, 48, n, seed = n)
      assert(MediaStreams.gifFrameCount(b).contains(n), s"frames=$n")
    }
    // Single-frame static GIF from the image generator has 0 descriptors
    // (header-only fixture) — parses, no frames, no throw.
    assert(MediaStreams.gifFrameCount(MediaGen.gif(32, 32)).isDefined)
  }

  test("gif walk survives truncation: counts only fully-present frames, never throws") {
    val b = MediaGen.gifAnimated(32, 32, 10, seed = 3)
    (0 until b.length by 5).foreach { cut =>
      val r = MediaStreams.gifFrameCount(b.take(cut))
      r.foreach(n => assert(n <= 10))
    }
    assert(MediaStreams.gifFrameCount("GIF89a".getBytes).isEmpty) // below minimum
    assert(MediaStreams.gifFrameCount("PNG???????????".getBytes).isEmpty)
  }

  test("frame sampling: every-kth with frame 0 always included") {
    assert(MediaStreams.sampleFrames(10, 4) == Seq(0, 4, 8))
    assert(MediaStreams.sampleFrames(1, 4) == Seq(0))
    assert(MediaStreams.sampleFrames(0, 4) == Seq.empty)
  }
}

/** The q52 media-features query: Spark-side plumbing over the real
  * container walks (chunk/frame explode → per-kind roll-up).
  */
class MediaFeaturesQuerySpec extends SparkSuite {
  test("q52 rolls up audio chunks and sampled frames per kind") {
    val df = SparkEntry.queries("q52_media_features")(spark, "/root/testdata/sf0.001")
    val byKind = df.collect().map(r => r.getString(0) -> r).toMap
    assert(byKind.keySet == Set("audio_chunk", "frame_sample"))
    val audio = byKind("audio_chunk")
    val video = byKind("frame_sample")
    // All 200 payloads of each kind parsed (no silent drops).
    assert(audio.getAs[Long]("n_docs") == 200L && video.getAs[Long]("n_docs") == 200L)
    // Every audio doc is ≥200ms → at least one chunk each, and summed
    // chunk durations cover ≥200ms per doc.
    assert(audio.getAs[Long]("n_features") >= 200L)
    assert(audio.getAs[Long]("total_ms") >= 200L * 200)
    // Frame stride 4 over ≤32 frames → max sampled index ≤ 28.
    assert(video.getAs[Int]("max_idx") <= 28)
  }
}
