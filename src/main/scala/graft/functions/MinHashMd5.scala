package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `k` MinHash minima over a shingle array in ONE pass — value-
  * identical to `array_min(transform(sh, x -> md5(concat('<i>#', x))))`
  * for i in 0 until k (the ANSI-SQL-reproducible MinHash family the
  * DuckDB oracles check), but as a native expression.
  *
  * Why native instead of the composed form: `transform` lambdas are
  * CodegenFallback — evaluated interpreted and invisible to codegen
  * subexpression elimination — so the composed 8-seed pipeline
  * re-walked the shingle array once per seed per REFERENCE (band
  * columns, pushed-down null filters and union branches each paid it
  * again: measured 51 s for one self-join over a 5k-doc corpus). One
  * fused pass computes each shingle's UTF-8 bytes once and its k
  * digests with a reused thread-local MessageDigest: same values,
  * ~10× less work, codegen-friendly call site.
  *
  * Exactness notes: Spark's `md5` is lowercase hex of the UTF-8
  * octets; `concat('<i>#', x)` prepends the seed prefix bytes;
  * `array_min` ignores null elements and returns null on empty input.
  * Unsigned byte-wise digest comparison == lexicographic hex
  * comparison (each byte maps to two hex chars monotonically), so
  * minima are tracked on raw digests and hex-encoded once at the end.
  */
case class MinHashMd5(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_md5 needs array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashMd5.minima(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashMd5.minima(($c), $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashMd5 =
    copy(child = newChild)

  override def prettyName: String = "minhash_md5"
}

object MinHashMd5 {

  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Seed prefixes `"<i>#"` as bytes, cached for the seeds seen. */
  @volatile private var prefixes: Array[Array[Byte]] = Array.empty
  private def prefix(i: Int): Array[Byte] = {
    var p = prefixes
    if (i >= p.length) synchronized {
      p = prefixes
      if (i >= p.length) {
        p = Array.tabulate(i + 1)(s => s"$s#".getBytes(UTF_8))
        prefixes = p
      }
    }
    p(i)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val hexChars = "0123456789abcdef".toCharArray
  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Static entry shared by interpreted eval and generated code.
    * NOT named `eval` — see [[SimHash64.hash64]]: a companion method
    * clashing with the class's `eval(InternalRow)` gets no static
    * forwarder and breaks codegen compilation (interpreted fallback). */
  def minima(arr: ArrayData, k: Int): ArrayData = {
    val minima = new Array[Array[Byte]](k)
    val digest = digests.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { // null shingles: array_min ignores them
        val shingleBytes = arr.getUTF8String(i).getBytes
        var s = 0
        while (s < k) {
          digest.reset()
          digest.update(prefix(s))
          digest.update(shingleBytes)
          val d = digest.digest()
          if (minima(s) == null || unsignedLess(d, minima(s))) minima(s) = d
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(minima.map(m =>
      if (m == null) null else UTF8String.fromString(hex(m))): Array[Any])
  }

  /** Column-level API. */
  def minhash_md5(shingles: Column, numHashes: Int): Column =
    GraftSqlBridge.column(
      MinHashMd5(GraftSqlBridge.expression(shingles), numHashes))
}
