package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array — a native Catalyst expression so
  * near-dup fingerprinting stays inside codegen with zero UDF/serde
  * overhead (the hot path of a 100 TB dedup sweep).
  *
  * Algorithm (public: Charikar, STOC 2002 "Similarity estimation
  * techniques from rounding algorithms"): per token, an FNV-1a 64-bit
  * hash; each of its 64 bits votes +1/−1 on one lane; the sign of each
  * lane's total is the output bit. Hamming distance between simhashes
  * approximates cosine distance between token multisets.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.hash64(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash64.hash64(($c))")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** FNV-1a 64-bit — simple, public, allocation-free. */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Static entry shared by interpreted eval and generated code.
    * NOT named `eval`: the case class (via UnaryExpression) already
    * has an `eval(InternalRow)`, and a companion method whose name
    * clashes with a class method gets NO static forwarder — the
    * generated Java then resolved `SimHash64.eval(arr)` to the
    * instance method, failed to compile, and every stage with this
    * expression silently fell back to interpreted execution. */
  def hash64(arr: ArrayData): Long = {
    val lanes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = fnv1a64(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) lanes(b) += 1 else lanes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (lanes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column-level API. */
  def simhash64(tokens: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(tokens)))
}
