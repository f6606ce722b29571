package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Greedy longest-match subword token count — the deterministic core
  * of BPE/WordPiece-style length accounting (public algorithm: the
  * WordPiece greedy matcher, Wu et al. 2016 §4.1; BPE vocabularies,
  * Sennrich et al. 2016). Given a word array and a FOLDABLE subword
  * vocabulary, each word is consumed left-to-right by repeatedly
  * taking the LONGEST vocabulary entry prefixing the remainder, or a
  * single character when none matches (the UNK fallback, still one
  * token); the result is the total token count over all words.
  *
  * Counting only — token strings never materialize — because every
  * downstream consumer (budgets, packing, mixtures) needs lengths,
  * and emitting Σ subword strings would 2× the corpus on the wire.
  *
  * A native Catalyst expression, not a UDF: the vocabulary is built
  * ONCE per expression instance (not per row) and shipped into
  * generated code via `addReferenceObj`, so the greedy loop — O(len ×
  * #lengths) hash probes per word — runs inside whole-stage codegen
  * with zero serde. Unicode note: positions are UTF-16 code units
  * (String semantics), which equals DuckDB's character semantics for
  * all BMP text (ASCII + CJK); supplementary-plane codepoints would
  * count as 2 fallback tokens where DuckDB sees 1.
  */
case class SubwordCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "subword_count vocabulary must be foldable (a literal array)")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"subword_count needs (array<string>, array<string>), got ($l, $r)")
    }

  /** Built once per expression instance from the foldable vocabulary;
    * referenced (not rebuilt) by both interpreted and generated code. */
  @transient private lazy val vocab: SubwordCount.Vocab =
    SubwordCount.buildVocab(
      right.eval(null).asInstanceOf[ArrayData])

  override def nullSafeEval(words: Any, vocabArr: Any): Any =
    SubwordCount.countAll(words.asInstanceOf[ArrayData], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subwordVocab", vocab,
      classOf[SubwordCount.Vocab].getName)
    nullSafeCodeGen(ctx, ev, (w, _) =>
      s"${ev.value} = graft.functions.SubwordCount.countAll($w, $ref);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubwordCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "subword_count"
}

object SubwordCount {

  /** Length-bounded vocabulary: the greedy loop probes lengths
    * maxLen..minLen then falls back to one character. */
  final class Vocab(val minLen: Int, val maxLen: Int,
      val set: java.util.HashSet[String]) extends Serializable

  def buildVocab(arr: ArrayData): Vocab = {
    val set = new java.util.HashSet[String]()
    var minL = Int.MaxValue
    var maxL = 1
    var i = 0
    val n = if (arr == null) 0 else arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        if (s.nonEmpty) {
          set.add(s)
          if (s.length < minL) minL = s.length
          if (s.length > maxL) maxL = s.length
        }
      }
      i += 1
    }
    if (set.isEmpty) minL = 1
    new Vocab(math.min(minL, maxL), maxL, set)
  }

  /** Static entry shared by interpreted eval and generated code (named
    * to avoid the companion/instance `eval` forwarder clash documented
    * on [[SimHash64.hash64]]). */
  def countAll(words: ArrayData, vocab: Vocab): Long = {
    var total = 0L
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i).toString
        if (w.nonEmpty) total += countWord(w, vocab)
      }
      i += 1
    }
    total
  }

  def countWord(w: String, vocab: Vocab): Long = {
    val len = w.length
    var pos = 0
    var cnt = 0L
    while (pos < len) {
      var step = 1
      var l = math.min(vocab.maxLen, len - pos)
      var found = false
      while (!found && l >= vocab.minLen) {
        if (vocab.set.contains(w.substring(pos, pos + l))) {
          step = l
          found = true
        }
        l -= 1
      }
      pos += step
      cnt += 1
    }
    cnt
  }

  /** Column-level API. */
  def subwordCount(words: Column, vocabulary: Column): Column =
    GraftSqlBridge.column(SubwordCount(
      GraftSqlBridge.expression(words),
      GraftSqlBridge.expression(vocabulary)))
}
