package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering column for multi-dimension data
  * skipping — the `OPTIMIZE ZORDER BY` of Delta/Databricks and
  * Iceberg's `sort_order(zorder(...))`, reduced to plain Spark
  * columns.
  *
  * Why: [[Versioned.compactPublish]] clusters lexicographically — a
  * range probe on the FIRST sort column prunes, but every file spans
  * nearly the full domain of the second, so probes on it read the
  * whole table. Interleaving the bits of per-column QUANTILE RANKS
  * gives every file a tight bounding rectangle in all dimensions at
  * once: a probe on either column (or a 2-D rectangle) skips every
  * file whose rectangle misses it. The trade is bounded: each
  * dimension's pruning power is ~2^(bits) coarser than a dedicated
  * sort, which is exactly the Morton-curve locality bound.
  *
  * Scale shape: quantile boundaries come from ONE `approxQuantile`
  * pass (Greenwald–Khanna sketch, driver collect of 2^bits − 1 values
  * per column — k-bounded); the rank map and bit interleave are pure
  * codegen'd column arithmetic (no UDF, no shuffle beyond the
  * compaction's own range partition). Equi-DEPTH ranks (not
  * equi-width buckets) mean skewed columns still spread across the
  * curve — a hot key lands in many buckets instead of one giant one.
  *
  * Null discipline: parquet writes no min/max for an all-null chunk
  * and [[ZoneMaps]] marks mixed-null chunks from the values present;
  * here nulls rank to bucket 0 so they cluster together at the curve's
  * origin and never smear other files' bounds. */
object ZOrder {

  /** Per-column equi-depth boundaries for `bits`-bit bucket ids:
    * 2^bits − 1 interior quantiles from one approximate pass. Columns
    * must be numeric (cast upstream; string z-order needs a rank
    * dictionary, which is a different trade). */
  def boundaries(df: DataFrame, cols: Seq[String], bits: Int)
      : Map[String, Array[Double]] = {
    require(bits >= 1 && bits <= 16, "zorder: 1..16 bits per dimension")
    require(cols.nonEmpty, "zorder needs at least one column")
    val n = (1 << bits) - 1
    val probs = (1 to n).map(_.toDouble / (n + 1)).toArray
    cols.map { c =>
      val bs = df.stat.approxQuantile(c, probs, 0.001)
      c -> bs
    }.toMap
  }

  /** Bucket id of `c` under sorted boundary array `bs`: the count of
    * boundaries ≤ value — a codegen'd fold over an array literal
    * (O(2^bits) comparisons per row; a compaction-time rewrite cost,
    * linear and shuffle-free). Nulls → 0. */
  private def bucketId(c: Column, bs: Array[Double]): Column = {
    val lits = array(bs.map(lit): _*)
    when(c.isNull, lit(0)).otherwise(
      aggregate(lits, lit(0),
        (acc, b) => acc + when(c.cast("double") >= b, 1).otherwise(0)))
  }

  /** The interleaved Morton code of `cols` as a LongType column:
    * bit i of dimension d lands at position i * dims + d, so equal
    * prefixes mean nearby cells in every dimension. Pure bit
    * arithmetic on the bucket ids — whole-stage codegen keeps this in
    * the compaction scan. */
  def zcol(cols: Seq[String], bnds: Map[String, Array[Double]],
      bits: Int): Column = {
    val ids = cols.map(c => bucketId(col(c), bnds(c)).cast("long"))
    val dims = cols.size
    val terms = for {
      (id, d) <- ids.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(id, i).bitwiseAND(1L), i * dims + d)
    terms.reduce(_.bitwiseOR(_))
  }
}
