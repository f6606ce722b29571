package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native vector kernels for the similarity operators.
  *
  * Strategy: quantize each embedding ONCE into scale-6 fixed-point
  * longs (exactly `CAST(CAST(x AS DOUBLE) AS DECIMAL(12,6))` — same
  * HALF_UP BigDecimal rounding as Spark's cast, same value DuckDB
  * produces), then every pairwise dot product is a pure long
  * multiply-add loop: exact, order-independent, overflow-free for
  * |x| < 3·10⁵, and ~20× cheaper than a decimal lambda fold per pair.
  * The expensive BigDecimal step runs N times, not N·K times.
  */
case class VectorQuantize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // A vector with any NaN/Infinity/|x|>~9.2e12 element quantizes to
  // NULL (coerce-to-null, like every other coercion in the engine) —
  // one corrupt embedding must not fail a 100 TB stage.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"vector_quantize needs array<float|double>, got $other")
  }

  // lazy: child.dataType is only legal after resolution
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    VectorOps.quantize(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.VectorOps.quantize($c, $isFloat);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): VectorQuantize =
    copy(child = newChild)
  override def prettyName: String = "vector_quantize"
}

/** Exact dot product of two quantized vectors: Σ aᵢ·bᵢ as a scale-12
  * fixed-point long. */
case class DotLong(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"dot_long needs array<long> × array<long>, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOps.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotLong =
    copy(left = l, right = r)
  override def prettyName: String = "dot_long"
}

/** The centroid codebook an [[ArgmaxCosine]] probes: parallel arrays
  * of labels, quantized vectors, and precomputed norms. Bounded (k
  * centroids) and embedded in the plan as a reference object — the
  * IVF coarse-assignment equivalent of a broadcast, without the join.
  */
case class CentroidCodebook(labels: Array[Long],
    vecs: Array[Array[Long]], norms: Array[Double]) {
  require(labels.length == vecs.length && vecs.length == norms.length,
    "codebook arrays must be parallel")
  require(labels.nonEmpty, "empty codebook")
}

/** Nearest-centroid assignment as ONE map-side expression: argmax of
  * fixed-point cosine over the codebook, returning
  * struct<sim:double, c_label:bigint> (ties → highest label, matching
  * the max(struct) convention elsewhere).
  *
  * Why an expression and not `crossJoin(centroids) + max(struct)`:
  * the join form explodes every corpus row ×k, SHUFFLES the pairs,
  * and — because structs aren't hash-aggregable — aggregates them
  * with a SortAggregate. This form touches each row once, in place:
  * no explode, no exchange, no sort, and it stays inside whole-stage
  * codegen via the same static-helper pattern as [[DotLong]]. */
case class ArgmaxCosine(left: Expression, right: Expression,
    cents: CentroidCodebook) extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("sim", DoubleType, nullable = false),
    StructField("c_label", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"argmax_cosine needs (array<long>, double), got $other")
    }

  override def nullSafeEval(v: Any, n: Any): Any =
    VectorOps.argmaxCosine(v.asInstanceOf[ArrayData],
      n.asInstanceOf[Double], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebook", cents,
      "graft.functions.CentroidCodebook")
    defineCodeGen(ctx, ev, (v, n) =>
      s"graft.functions.VectorOps.argmaxCosine($v, $n, $ref)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : ArgmaxCosine = copy(left = l, right = r)
  override def prettyName: String = "argmax_cosine"
}

/** Random-hyperplane LSH bucket (Charikar) over a QUANTIZED vector:
  * `planes` sign bits, plane i,j components ±1 derived from a
  * splitmix64 hash — one native pass, long arithmetic only. */
case class LshBucket64(child: Expression, planes: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"lsh_bucket needs array<long> (quantized), got $other")
  }

  override def nullSafeEval(input: Any): Any =
    VectorOps.lshBucket(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorOps.lshBucket($c, $planes)")

  override protected def withNewChildInternal(newChild: Expression): LshBucket64 =
    copy(child = newChild)
  override def prettyName: String = "lsh_bucket"
}

object VectorOps {
  final val Scale = 6
  /** 10^(2·Scale): a scale-12 dot in fixed point → double divisor. */
  final val DotDivisor = 1e12

  /** Max |x| a scale-6 fixed-point long can hold without overflow
    * (Long.MaxValue / 10^6, with headroom). */
  final val MaxAbs = 9.0e12

  /** Returns null (⇒ NULL vector) if any element is NaN/Infinity or
    * beyond fixed-point range — coerce-to-null, never a thrown
    * `NumberFormatException` that would fail the whole stage. */
  def quantize(arr: ArrayData, isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val d = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      if (!java.lang.Double.isFinite(d) || math.abs(d) > MaxAbs) return null
      // BigDecimal.valueOf == Double.toString-based, HALF_UP: exactly
      // Spark's double→decimal cast (and DuckDB's, for these values)
      out(i) = java.math.BigDecimal.valueOf(d)
        .setScale(Scale, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
      i += 1
    }
    new GenericArrayData(out)
  }

  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** splitmix64 finalizer (public domain, Steele et al.) — cheap
    * stateless hash for deterministic Rademacher plane components. */
  private def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def lshBucket(v: ArrayData, planes: Int): Long = {
    val n = v.numElements()
    var bucket = 0L
    var j = 0
    while (j < planes) {
      var acc = 0L
      var i = 0
      while (i < n) {
        val sign = if ((mix64(i.toLong * planes + j) & 1L) == 1L) 1L else -1L
        acc += sign * v.getLong(i)
        i += 1
      }
      if (acc > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  /** Column API. */
  def vector_quantize(v: Column): Column =
    GraftSqlBridge.column(VectorQuantize(GraftSqlBridge.expression(v)))
  /** See [[ArgmaxCosine]]. Identical arithmetic to the crossJoin form:
    * cosine = (dot/10^12) / (norm·cnorm), best by (sim, label). */
  def argmaxCosine(v: ArrayData, norm: Double,
      cents: CentroidCodebook): org.apache.spark.sql.catalyst.InternalRow = {
    var bestSim = Double.NegativeInfinity
    var bestLabel = Long.MinValue
    var c = 0
    while (c < cents.labels.length) {
      val cv = cents.vecs(c)
      val n = math.min(v.numElements(), cv.length)
      var acc = 0L
      var i = 0
      while (i < n) { acc += v.getLong(i) * cv(i); i += 1 }
      val sim = (acc.toDouble / DotDivisor) / (norm * cents.norms(c))
      if (sim > bestSim || (sim == bestSim && cents.labels(c) > bestLabel)) {
        bestSim = sim
        bestLabel = cents.labels(c)
      }
      c += 1
    }
    // degenerate input (zero-norm vector ⇒ every sim is NaN): neither
    // branch above ever fires. Fall back to the HIGHEST label — the
    // same direction as the tie-break — with sim NaN, instead of
    // leaking the (-Infinity, Long.MinValue) loop sentinel as a
    // phantom cell. Unreachable for real corpora (zero embeddings
    // carry no signal and should be filtered upstream), but the
    // kernel must stay deterministic on any input.
    if (bestLabel == Long.MinValue && cents.labels.nonEmpty) {
      var c2 = 0
      while (c2 < cents.labels.length) {
        if (cents.labels(c2) > bestLabel) bestLabel = cents.labels(c2)
        c2 += 1
      }
      bestSim = Double.NaN
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestSim, bestLabel))
  }

  def dot_long(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotLong(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def lsh_bucket(v: Column, planes: Int = 16): Column =
    GraftSqlBridge.column(LshBucket64(GraftSqlBridge.expression(v), planes))
  def argmax_cosine(v: Column, norm: Column, cents: CentroidCodebook): Column =
    GraftSqlBridge.column(ArgmaxCosine(
      GraftSqlBridge.expression(v), GraftSqlBridge.expression(norm), cents))

  /** Exact cosine between two quantized vectors given precomputed
    * norms (computed from the same fixed-point dots). */
  def cosineQ(dotAB: Column, normA: Column, normB: Column): Column = {
    import org.apache.spark.sql.functions._
    (dotAB.cast(DoubleType) / lit(DotDivisor)) / (normA * normB)
  }

  def normQ(selfDot: Column): Column = {
    import org.apache.spark.sql.functions._
    sqrt(selfDot.cast(DoubleType) / lit(DotDivisor))
  }
}
