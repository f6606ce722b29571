package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Ordered BPE merge application as ONE Catalyst expression — the
  * segmentation kernel behind q146/q147/q148 (BPE: Sennrich et al.
  * 2016; the double-space symbol encoding and literal leftmost
  * non-overlapping replace semantics are TextOps' — and the training
  * loop's `String.replace` — verbatim).
  *
  * Why an expression and not a `foldLeft` of built-in `replace`
  * columns: the fold builds ONE PLAN NODE PER MERGE, so a realistic
  * 32k-merge vocabulary becomes a 32,000-deep nested expression tree —
  * analysis and optimizer cost superlinear in plan size, and
  * whole-stage codegen blows the JVM method-size limit and falls back
  * to interpreted per-expression eval exactly on the corpus-wide scan
  * where plan shape matters most (review finding, r16). Here the
  * learned merge table is a PER-INSTANCE array shipped into generated
  * code via `addReferenceObj`: plan size is O(1) in vocabulary size,
  * per-row cost stays ∝ merges (each no-op merge is one `indexOf`
  * miss returning the same String reference), and the kernel runs
  * inside whole-stage codegen with zero serde — the
  * [[SubwordCount]]/[[MinHashMd5]] discipline.
  *
  * Semantics contract, pinned by [[graft.KernelPropertySpec]] against
  * an independent fold-of-`replace` evaluation: for each (pattern,
  * replacement) pair IN LEARNED ORDER, replace every leftmost
  * non-overlapping occurrence — `java.lang.String.replace`, which is
  * also what the training loop folds, so train and apply share one
  * scan semantics by construction. */
case class BpeApply(child: Expression, table: BpeApply.MergeTable)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_apply needs a string column, got $other")
    }

  override def nullSafeEval(s: Any): Any =
    BpeApply.applyAll(s.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table,
      classOf[BpeApply.MergeTable].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.BpeApply.applyAll($s, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)

  override def prettyName: String = "bpe_apply"
}

object BpeApply {

  /** The learned merges as parallel pattern/replacement arrays, in
    * learned order. A holder class (not raw Seqs in the case-class
    * signature) so plan strings render as a count, not 32k pairs. */
  final class MergeTable(val pats: Array[String], val reps: Array[String])
      extends Serializable {
    require(pats.length == reps.length, "merge table arity mismatch")
    override def toString: String = s"merges(${pats.length})"
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def applyAll(s: UTF8String, table: MergeTable): UTF8String = {
    var cur = s.toString
    val pats = table.pats
    val reps = table.reps
    var i = 0
    while (i < pats.length) {
      // String.replace returns `this` on an indexOf miss — a no-op
      // merge costs one scan, no allocation
      cur = cur.replace(pats(i), reps(i))
      i += 1
    }
    UTF8String.fromString(cur)
  }

  /** Column-level API over the TextOps symbol encoding: merge (l, r)
    * means pattern " l  r " → replacement " lr ". */
  def applyBpe(s: Column, merges: Seq[(String, String)]): Column = {
    val table = new MergeTable(
      merges.map { case (l, r) => s" $l  $r " }.toArray,
      merges.map { case (l, r) => s" $l$r " }.toArray)
    GraftSqlBridge.column(BpeApply(GraftSqlBridge.expression(s), table))
  }
}
