package graft

import graft.pdf.PdfCrypt
import org.scalatest.funsuite.AnyFunSuite

/** Known-answer vectors for the PDF standard security handler — the
  * round-4 ADVICE closure: PdfCrypt was previously validated only by
  * writer-twin round-trips (PdfWriter and PdfParser share it), so a
  * shared spec misreading would stay green. These constants were
  * derived by an INDEPENDENT implementation of ISO 32000-1 §7.6
  * Algorithms 1/2/3/5 and ISO 32000-2 §7.6.4.3.3-4 (2.A/2.B/hash
  * variants), written separately in Python over hashlib +
  * python-cryptography, and are pinned here as hex so any drift in
  * either twin fails loudly.
  *
  * Shared inputs: first file-ID element = bytes 0x10..0x1F, P = -44,
  * owner password "owner-secret", user password EMPTY (the crawl case),
  * plaintext "Known answer: Hello PDF crypt!".
  */
class PdfCryptVectorsSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val id = Array.range(0x10, 0x20).map(_.toByte)
  private val p = -44
  private val plain = "Known answer: Hello PDF crypt!".getBytes("ISO-8859-1")

  test("RC4 R3 V2 128-bit: O, file key, U, per-object key, decryption") {
    val o = PdfCrypt.computeO("owner-secret".getBytes, Array.emptyByteArray, 3, 128)
    assert(hex(o) == "913b073f5b65954c8b6da22169971a177b7e6d94a106ff75c0c16296bc15412e")
    val fk = PdfCrypt.fileKey(Array.emptyByteArray, o, p, id, 3, 128)
    assert(hex(fk) == "82874428923e14e9d8c94dbec5c55b66")
    val u = PdfCrypt.computeU(fk, id, 3)
    assert(hex(u) == "b352b601e7fdb3b68bc3d58f95d500e500000000000000000000000000000000")
    // Algorithm 6 round-trip: the empty password opens this file.
    assert(PdfCrypt.tryEmptyUserPassword(o, u, p, id, 3, 128).exists(_.sameElements(fk)))
    val ok = PdfCrypt.objKey(fk, 7, 0)
    assert(hex(ok) == "4c6bf4783cc02052e62a72bd4f5ae58d")
    val ct = unhex("fcdfd5b120f3451a5c9e9ebb3051db50bbecf79330b8e102a117a34ccee2")
    assert(PdfCrypt.rc4(ok, ct).sameElements(plain))
  }

  test("AESV2 R4 128-bit, EncryptMetadata=false: file key, U, sAlT object key, decryption") {
    val o = PdfCrypt.computeO("owner-secret".getBytes, Array.emptyByteArray, 4, 128)
    val fk = PdfCrypt.fileKey(Array.emptyByteArray, o, p, id, 4, 128,
      encryptMetadata = false)
    assert(hex(fk) == "d8b60ba62d62c7f7dd7037eaabf485ca")
    val u = PdfCrypt.computeU(fk, id, 4)
    assert(hex(u) == "36553b53f397b5434750884a4a81bd7300000000000000000000000000000000")
    assert(PdfCrypt.tryEmptyUserPassword(o, u, p, id, 4, 128,
      encryptMetadata = false).exists(_.sameElements(fk)))
    val ok = PdfCrypt.objKeyAes(fk, 12, 1)
    assert(hex(ok) == "0a76e28955d88e6dc91233cbf1621066")
    val ct = unhex("a0a1a2a3a4a5a6a7a8a9aaabacadaeaf37b26b64d2aaccffe583749603105084413fe890497e463443387e5c7f45a4c4")
    assert(PdfCrypt.aesDecrypt(ok, ct).sameElements(plain))
  }

  test("AESV3 R6 256-bit: Algorithm 2.B hash, U/UE validation, file-key recovery, decryption") {
    val vSalt = Array.range(0x01, 0x09).map(_.toByte)
    val kSalt = Array.range(0x11, 0x19).map(_.toByte)
    val fk = Array.range(0x40, 0x60).map(_.toByte)
    assert(hex(PdfCrypt.hash2B(Array.emptyByteArray, vSalt, Array.emptyByteArray))
      == "8d1efb4f1bdbb651341704c2139de4f6be05d6d4609af56916b21646ed74825c")
    val u = unhex("8d1efb4f1bdbb651341704c2139de4f6be05d6d4609af56916b21646ed74825c01020304050607081112131415161718")
    val ue = unhex("382dfa377b1a5b5858f3c36b22e0cc23f074d791a5804db9cc4c167eb475335b")
    // Writer twin reproduces the independent implementation's U/UE...
    val (uW, ueW) = PdfCrypt.computeUV5(6, fk, vSalt, kSalt)
    assert(hex(uW) == hex(u) && hex(ueW) == hex(ue))
    // ...and Algorithm 2.A recovers the exact file key from them.
    assert(PdfCrypt.tryEmptyUserPasswordV5(u, ue, 6).exists(_.sameElements(fk)))
    val ct = unhex("c0c1c2c3c4c5c6c7c8c9cacbcccdcecf76c2c8a0047480fc60fc0227d03bf34d291eb3ebfa058378ab3561a11dbe81ec")
    assert(PdfCrypt.aesDecrypt(fk, ct).sameElements(plain))
  }

  test("AESV3 R5 256-bit: SHA-256 hash variant U/UE and file-key recovery") {
    val vSalt = Array.range(0x01, 0x09).map(_.toByte)
    val kSalt = Array.range(0x11, 0x19).map(_.toByte)
    val fk = Array.range(0x40, 0x60).map(_.toByte)
    val u = unhex("66840dda154e8a113c31dd0ad32f7f3a366a80e8136979d8f5a101d3d29d6f7201020304050607081112131415161718")
    val ue = unhex("8320672737b4f4c686030f502a0bb92b6511b1a5bb3f839f2f32cd9e55ba6e8e")
    val (uW, ueW) = PdfCrypt.computeUV5(5, fk, vSalt, kSalt)
    assert(hex(uW) == hex(u) && hex(ueW) == hex(ue))
    assert(PdfCrypt.tryEmptyUserPasswordV5(u, ue, 5).exists(_.sameElements(fk)))
  }
}
