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

  /** Static entry shared by interpreted eval and generated code (named
    * NOT `eval` — see SimHash64's forwarder note). */
  def hashes(s: UTF8String): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < K) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - K + 1)
    var h = 0L
    var i = 0
    while (i < K) { // first window: Horner
      h = mulmod(h, B) + cps(i)
      if (h >= M) h -= M // cp < 2^21 ≪ M, one subtract suffices
      i += 1
    }
    out(0) = h
    i = 1
    while (i <= n - K) { // slide: drop cps(i−1), admit cps(i+K−1)
      h -= mulmod(cps(i - 1), PowK1)
      if (h < 0) h += M
      h = mulmod(h, B) + cps(i + K - 1)
      if (h >= M) h -= M
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
