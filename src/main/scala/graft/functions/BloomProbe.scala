package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a broadcast [[BloomFilter]] — the map-side
  * prefilter for probe-style joins whose build side outgrows a
  * broadcast hash table of full strings (eval-set n-grams at benchmark
  * scale: ~10⁸ grams is GBs of strings but ~120 MB of bloom bits at
  * 1% fpp). Spark's own `bloom_filter_agg`/`might_contain` pair is
  * runtime-filter-internal and not resolvable from the public API
  * (UNRESOLVED_ROUTINE), hence this expression.
  *
  * Bloom filters have NO false negatives, so `filter(mightContain(c))`
  * never drops a true match — callers follow with an exact join over
  * the surviving candidates and the composition stays exact (the ~fpp
  * false positives are eliminated there).
  *
  * The filter rides an explicit `Broadcast` (shipped once per executor)
  * rather than a plan `Literal` (shipped with every task closure), and
  * the probe stays inside whole-stage codegen via `addReferenceObj`.
  * Byte-level probe (`mightContainBinary` on UTF-8 bytes) matches what
  * `DataFrameStatFunctions.bloomFilter` inserts for string columns.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain needs string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    bloom.value.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // referenced object, not embedded literal: the broadcast handle is
    // bytes in the task closure; the filter itself moves via the
    // broadcast mechanism once per executor
    val bc = ctx.addReferenceObj("graftBloomBc", bloom,
      classOf[Broadcast[_]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.BloomFilter)$bc.value())" +
        s".mightContainBinary(($c).getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContain = copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomProbe {
  /** Column-level API. */
  def mightContain(c: Column, bloom: Broadcast[BloomFilter]): Column =
    GraftSqlBridge.column(BloomMightContain(GraftSqlBridge.expression(c), bloom))
}
