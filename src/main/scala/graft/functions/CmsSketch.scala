package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * native Catalyst [[TypedImperativeAggregate]] — the frequency-
  * estimation sibling of [[KmvSketch]]'s distinct-count.
  *
  * State is a depth×width counter matrix flattened row-major into
  * `long[depth*width]`. Update increments one counter per row using the
  * caller-supplied bucket indices; merge is ELEMENTWISE ADDITION —
  * fully commutative and associative, so the sketch is partition- and
  * merge-order-invariant (unlike Misra–Gries, whose evictions depend on
  * the merge tree). That exactness is what makes the whole sketch
  * oracle-replayable: each counter is just `COUNT(*)` of the items
  * hashing to its bucket, and a point estimate is the MIN of its
  * depth counters — both plain SQL over the same md5-derived buckets,
  * so DuckDB reproduces estimate values bit-for-bit.
  *
  * Input: `array<long>` of length `depth` — the bucket index per row,
  * derived OUTSIDE the aggregate from non-overlapping 8-hex-digit
  * slices of one `md5(item)` (one digest serves all rows; the slices
  * are pairwise-independent enough for the CM guarantee in practice,
  * and, critically, both engines can compute them). Output: the
  * flattened counters; the caller indexes `row*width + bucket` and
  * takes the min across rows.
  *
  * Aggregation physics at 100 TB: O(depth·width) state per group
  * regardless of item cardinality, map-side partial aggregation, and a
  * shuffle that carries one counter matrix per group instead of the
  * token stream — the same reason q109's KMV beats exact
  * countDistinct at scale. Point estimates are one-sided:
  * `est ≥ exact` always (counters only over-count via collisions),
  * with the standard (ε = e/width, δ = e^−depth) error bound.
  */
case class CmsSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && width >= 1, s"cms_sketch needs depth/width >= 1, got $depth x $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == depth,
        s"cms_sketch: bucket array has ${arr.numElements()} entries, expected depth=$depth")
      var r = 0
      while (r < depth) {
        val b = arr.getLong(r)
        require(b >= 0 && b < width, s"cms_sketch: bucket $b out of [0, $width)")
        buf(r * width + b.toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(child = newChildren.head)

  override def prettyName: String = "cms_sketch"
}

object CmsSketch {
  /** Column-level API: the flattened depth×width counter matrix. */
  def cmsSketch(buckets: Column, depth: Int, width: Int): Column =
    GraftSqlBridge.column(
      CmsSketch(GraftSqlBridge.expression(buckets), depth, width)
        .toAggregateExpression())
}
