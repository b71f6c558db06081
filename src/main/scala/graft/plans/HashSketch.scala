package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MD5 sketch kernels for the dedup query family.
  *
  * q24/q35 originally computed 16 minhashes as
  * `transform(sequence(0,15), j -> array_min(transform(shingles,
  * t -> md5(concat(j, ':', t)))))` — semantically right, but the
  * expression pipeline allocates, PER SHINGLE: 16 concat UTF8Strings,
  * 16 32-char hex UTF8Strings, plus 16 size-S intermediate arrays per
  * document for `array_min` to scan. q25 paid the same shape 32× (one
  * `aggregate` pass per simhash bit over an md5-hex array). At sf0.1
  * those three queries were ~58% of the whole bench suite — pure
  * allocation/GC churn, not hash arithmetic.
  *
  * These expressions keep the EXACT same md5 semantics (the one hash
  * both engines share, so the DuckDB oracles are unchanged) but do the
  * whole sketch in one pass with zero per-element allocation:
  * digests are compared as raw 16-byte arrays (lowercase hex encoding
  * is order-preserving byte-for-byte, so the min digest IS the min hex
  * string) and hex-encoded only for the 16 winners.
  *
  * Reference provenance: the dedup family itself is graft-added
  * (SURVEY.md §2.11 LLM-pipeline operators); md5 seeding scheme
  * matches the q24 oracle (`min(md5(seed || ':' || tok))`).
  */
object HashSketchUtil {
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val hexDigits = "0123456789abcdef".toCharArray
  // Seed prefixes "0:" .. "15:" as UTF-8 bytes, built once.
  private val seedPrefixes: Array[Array[Byte]] =
    Array.tabulate(16)(j => (j.toString + ":").getBytes("UTF-8"))

  private def hex(digest: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((digest(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(digest(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned byte-wise compare; negative iff a < b. Equal-length (16). */
  private def cmpDigest(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 16) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  /** 16 md5 minhashes (seeds 0..15, digest of "<seed>:<shingle>") in one
    * pass. Empty input → 16 nulls, matching `array_min` over an empty
    * array (callers filter those rows out; the shape is kept for parity).
    */
  def minhashMd5(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](16))
    val md = md5Local.get()
    val mins = Array.ofDim[Byte](16, 16)
    val buf = new Array[Byte](16)
    var first = true
    var s = 0
    while (s < n) {
      val tok = shingles.getUTF8String(s).getBytes
      var j = 0
      while (j < 16) {
        md.reset()
        md.update(seedPrefixes(j))
        md.update(tok)
        md.digest(buf, 0, 16)
        if (first || cmpDigest(buf, mins(j)) < 0)
          System.arraycopy(buf, 0, mins(j), 0, 16)
        j += 1
      }
      first = false
      s += 1
    }
    val out = new Array[Any](16)
    var j = 0
    while (j < 16) { out(j) = hex(mins(j)); j += 1 }
    new GenericArrayData(out)
  }

  /** 32-bit simhash from md5 hex-digit parity of (distinct) tokens, in
    * one pass: for hex position p (0-based), the bit counter moves +1 if
    * the ASCII code of the hex char is odd, else -1; output bit p is '1'
    * iff the final counter is > 0. Matches
    * `aggregate(hashes, 0, (acc,h) -> acc + (ascii(substring(h,p,1)) % 2
    * * 2 - 1)) > 0` without materializing any hex string: digit chars
    * '0'..'9' have ASCII parity of the nibble value, letters 'a'..'f'
    * (87+v) the opposite parity of v.
    */
  def simhashMd5(tokens: ArrayData): UTF8String = {
    val n = tokens.numElements()
    val counts = new Array[Int](32)
    val md = md5Local.get()
    val buf = new Array[Byte](16)
    var t = 0
    while (t < n) {
      md.reset()
      md.update(tokens.getUTF8String(t).getBytes)
      md.digest(buf, 0, 16)
      var i = 0
      while (i < 16) {
        val hi = (buf(i) >> 4) & 0xf
        val lo = buf(i) & 0xf
        counts(2 * i) += (if (asciiOdd(hi)) 1 else -1)
        counts(2 * i + 1) += (if (asciiOdd(lo)) 1 else -1)
        i += 1
      }
      t += 1
    }
    val out = new Array[Byte](32)
    var p = 0
    while (p < 32) { out(p) = (if (counts(p) > 0) '1' else '0').toByte; p += 1 }
    UTF8String.fromBytes(out)
  }

  /** ASCII parity of the hex char for nibble v: '0'+v for v<10 (parity of
    * v, '0'=48 even), 'a'+(v-10)=87+v otherwise (87 odd → opposite).
    */
  @inline private def asciiOdd(v: Int): Boolean =
    if (v < 10) (v & 1) == 1 else (v & 1) == 0
}

/** `minhash_md5(shingles)` — array of 16 lowercase-hex md5 minhashes,
  * seeds 0..15 prefixed as "<seed>:". See [[HashSketchUtil.minhashMd5]].
  */
case class MinhashMd5(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_md5"

  override protected def nullSafeEval(input: Any): Any =
    HashSketchUtil.minhashMd5(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashSketchUtil.minhashMd5($c)")

  override protected def withNewChildInternal(newChild: Expression): MinhashMd5 =
    copy(child = newChild)
}

/** `simhash_md5(tokens)` — 32-char '0'/'1' simhash string from md5
  * hex-digit parity. Caller supplies DISTINCT tokens (matching the
  * `array_distinct` in the original pipeline). See
  * [[HashSketchUtil.simhashMd5]].
  */
case class SimhashMd5(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_md5"

  override protected def nullSafeEval(input: Any): Any =
    HashSketchUtil.simhashMd5(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashSketchUtil.simhashMd5($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashMd5 =
    copy(child = newChild)
}
