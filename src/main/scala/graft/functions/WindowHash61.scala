package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hashes of every sliding K-char window of a
  * string, as a native Catalyst expression — the scale path the
  * ExactSubstr family's scaladocs promise: the q105/q107 shuffle keyed
  * by an 8-byte long instead of a 40-char string (≈5× less exchange
  * payload), with the window pass itself O(1) per position (Rabin-Karp
  * sliding update) instead of O(K), inside whole-stage codegen.
  *
  * Hash: h(w) = Σ cp_j · B^(K−1−j) mod M over the window's code
  * points, with B = 257 and M = 2^61 − 1 (Mersenne, so the 128-bit
  * product reduces with shifts — `Math.multiplyHigh`, no BigInteger).
  * Code points, not bytes, so the definition matches `substring`
  * semantics and is exactly replayable from DuckDB's `ord(substr(…))`
  * (see the q108 oracle). Collisions (~2⁻⁶¹ per pair) would be
  * collision-checked on the survivors in production; the oracle
  * computes the SAME hash, so cross-engine results agree regardless.
  */
case class WindowHash61(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"window_hash61 needs string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WindowHash61.hashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WindowHash61.hashes(($c))")

  override protected def withNewChildInternal(newChild: Expression): WindowHash61 =
    copy(child = newChild)

  override def prettyName: String = "window_hash61"
}

object WindowHash61 {
  /** Window width in code points — MUST match
    * [[graft.queries.Dedup.WindowChars]] (asserted in the spec). */
  final val K = 40
  final val M: Long = (1L << 61) - 1
  final val B: Long = 257L

  /** B^(K−1) mod M — the coefficient of the departing character. */
  final val PowK1: Long = {
    var p = 1L
    var i = 0
    while (i < K - 1) { p = mulmod(p, B); i += 1 }
    p
  }

  /** a·b mod M for a,b < M, via the Mersenne identity 2^64 ≡ 8. */
  def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // a,b < 2^61 ⇒ hi < 2^58
    val lo = a * b
    var r = (hi << 3) + (lo & M) + (lo >>> 61) // < 2^62 + 8: no overflow
    r = (r & M) + (r >>> 61)
    if (r >= M) r - M else r
  }

  /** Code point at byte offset `off`, packed with its UTF-8 byte
    * length as `(len << 32) | cp` so the cursor advance never decodes
    * twice. Matches `String.codePoints()` exactly: a 4-byte sequence
    * (a surrogate pair in UTF-16) is ONE code point here too. */
  private def decodeAt(s: UTF8String, off: Int): Long = {
    val b0 = s.getByte(off)
    val len = UTF8String.numBytesForFirstByte(b0)
    val cp = len match {
      // & 0xff keeps an invalid first byte (continuation byte at a
      // sequence start — unreachable for parquet-validated UTF-8)
      // non-negative so the hash invariants (cp < 2^21) always hold
      case 1 => b0 & 0xff
      case 2 => ((b0 & 0x1f) << 6) | (s.getByte(off + 1) & 0x3f)
      case 3 => ((b0 & 0x0f) << 12) | ((s.getByte(off + 1) & 0x3f) << 6) |
        (s.getByte(off + 2) & 0x3f)
      case _ => ((b0 & 0x07) << 18) | ((s.getByte(off + 1) & 0x3f) << 12) |
        ((s.getByte(off + 2) & 0x3f) << 6) | (s.getByte(off + 3) & 0x3f)
    }
    (len.toLong << 32) | cp.toLong
  }

  /** Static entry shared by interpreted eval and generated code (named
    * NOT `eval` — see SimHash64's forwarder note). Decodes code points
    * directly off the UTF8String's bytes with two cursors (admit /
    * depart), so the hot path allocates nothing but the output array —
    * no intermediate String, no int[] of code points. */
  def hashes(s: UTF8String): ArrayData = {
    val n = s.numChars() // code-point count: one byte walk, no alloc
    if (n < K) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - K + 1)
    var h = 0L
    var lead = 0 // byte offset of the next code point to admit
    var i = 0
    while (i < K) { // first window: Horner
      val packed = decodeAt(s, lead)
      h = mulmod(h, B) + (packed & 0xffffffffL)
      if (h >= M) h -= M // cp < 2^21 ≪ M, one subtract suffices
      lead += (packed >>> 32).toInt
      i += 1
    }
    out(0) = h
    var trail = 0 // byte offset of the departing code point
    i = 1
    while (i <= n - K) { // slide: drop cp at trail, admit cp at lead
      val dep = decodeAt(s, trail)
      trail += (dep >>> 32).toInt
      h -= mulmod(dep & 0xffffffffL, PowK1)
      if (h < 0) h += M
      val adm = decodeAt(s, lead)
      h = mulmod(h, B) + (adm & 0xffffffffL)
      if (h >= M) h -= M
      lead += (adm >>> 32).toInt
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level API. */
  def windowHash61(text: Column): Column =
    GraftSqlBridge.column(WindowHash61(GraftSqlBridge.expression(text)))

  /** The DuckDB power table for the oracle replay: B^(K−1−j) mod M for
    * j = 0…K−1, rendered as a HUGEINT list literal. */
  def duckdbPowersLiteral: String = {
    val pows = new Array[Long](K)
    pows(K - 1) = 1L
    var j = K - 2
    while (j >= 0) { pows(j) = mulmod(pows(j + 1), B); j -= 1 }
    pows.map(p => s"$p::HUGEINT").mkString("[", ",", "]")
  }
}
