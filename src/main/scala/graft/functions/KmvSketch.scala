package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded k-minimum-values state: the K smallest DISTINCT hash values
  * seen so far. Array-backed insertion sort — K is small (≤ a few
  * hundred) and updates are hot-path, so no tree allocation churn. */
final class KmvBuffer(val k: Int) {
  val vals = new Array[Long](k)
  var n = 0

  def insert(v: Long): Unit = {
    if (n == k && v >= vals(n - 1)) return
    // binary search for the insertion point; equal hit = duplicate
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (vals(mid) < v) lo = mid + 1 else hi = mid
    }
    if (lo < n && vals(lo) == v) return // distinct-only
    val last = math.min(n, k - 1)
    var i = last
    while (i > lo) { vals(i) = vals(i - 1); i -= 1 }
    if (lo < k) vals(lo) = v
    if (n < k) n += 1
  }

  def mergeFrom(o: KmvBuffer): Unit = {
    var i = 0
    while (i < o.n) { insert(o.vals(i)); i += 1 }
  }
}

/** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002;
  * Beyer et al., SIGMOD 2007 — the unbiased (k−1)/h(k) estimator) as a
  * native Catalyst [[TypedImperativeAggregate]].
  *
  * Why this exists next to Spark's own `approx_count_distinct`: HLL
  * register layouts are engine-private, so q37's sketch can only get a
  * rows-only check — KMV over an md5-derived hash is ENGINE-NEUTRAL
  * and deterministic, so the whole sketch replays exactly in DuckDB
  * (`ORDER BY hash LIMIT k` per group) and the estimate itself is
  * oracle-hash-checkable. Same aggregation physics as HLL: O(k) state
  * per group, map-side partial aggregation, associative-commutative
  * merge — the shape that makes distinct-count cheap at 100 TB
  * (shuffle carries ≤k longs per group, never the value stream).
  *
  * Input: a LONG hash uniform on [0, 2^32) (the md5-prefix integer of
  * `TextOps.uniformKeyOf`, pre-division). Output: the sorted ≤k
  * minima; the caller derives `est = (k−1)·2^32 / h(k)` (one exact
  * integer-to-double division — hash-stable cross-engine) or the
  * exact count when fewer than k distinct values exist.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 2, s"kmv_sketch needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: org.apache.spark.sql.catalyst.InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: KmvBuffer): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf.vals, buf.n))

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.vals(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    // values were serialized sorted-ascending; insert preserves order
    while (i < n) { buf.insert(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)

  override def prettyName: String = "kmv_sketch"
}

object KmvSketch {
  /** Column-level API: the sorted ≤k smallest distinct hashes. */
  def kmvSketch(hash: Column, k: Int): Column =
    GraftSqlBridge.column(
      KmvSketch(GraftSqlBridge.expression(hash), k)
        .toAggregateExpression())
}
