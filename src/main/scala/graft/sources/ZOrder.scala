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
      // approxQuantile ignores nulls: an all-null column yields an
      // empty array, which would persist as a boundary-less curve
      // line the reader cannot parse — refuse loudly at write time
      require(bs.nonEmpty,
        s"zorder: column $c has no non-null values — a curve cannot " +
          "be placed through it; drop it from the clustering columns")
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

  /** Persisted curve definition: (cols, bits, boundaries) written as a
    * tiny text sidecar (`_graft_zbounds`) inside a z-ordered data dir,
    * so a LATER maintenance publish can encode an appended tail onto
    * the SAME curve without re-sampling the table
    * ([[Versioned.zorderTailPublish]] — the incremental-clustering
    * posture of Databricks' liquid clustering / Iceberg's persisted
    * sort orders). Doubles round-trip through
    * `java.lang.Double.toString`/`parseDouble` (exact). Advisory
    * metadata by contract: absence (including the crash window between
    * a publish's commit and this write) means "full recluster
    * required", never a wrong curve. */
  final case class Bounds(cols: Seq[String], bits: Int,
      bnds: Map[String, Array[Double]])

  private val BoundsFile = "_graft_zbounds"
  private val BoundsHeader = "graft-zbounds\tv1"

  def writeBounds(spark: org.apache.spark.sql.SparkSession, dir: String,
      b: Bounds): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, BoundsFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val text = (s"$BoundsHeader\tbits=${b.bits}" +:
      b.cols.map(c => s"$c\t${b.bnds(c).map(_.toString).mkString(",")}"))
      .mkString("\n")
    val out = fs.create(p, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }

  def readBounds(spark: org.apache.spark.sql.SparkSession, dir: String)
      : Option[Bounds] = {
    val p = new org.apache.hadoop.fs.Path(dir, BoundsFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        new String(bytes, "UTF-8")
      } finally in.close()
      val lines = text.split('\n').toSeq
      val hdr = lines.head.split('\t')
      require(hdr.length == 3 && hdr(0) == "graft-zbounds" && hdr(1) == "v1",
        s"corrupt zbounds header in $p")
      val bits = hdr(2).stripPrefix("bits=").toInt
      val bnds = lines.tail.filter(_.nonEmpty).map { l =>
        // split with -1 limit: String.split drops trailing empty
        // fields, so a boundary-less line would destructure-crash
        // with a bare MatchError instead of the loud message below
        val parts = l.split("\t", -1)
        require(parts.length == 2 && parts(1).nonEmpty,
          s"corrupt zbounds column line '$l' in $p")
        parts(0) -> parts(1).split(',').map(java.lang.Double.parseDouble)
      }
      Some(Bounds(bnds.map(_._1), bits, bnds.toMap))
    }
  }

  /** The interleaved Morton code of `cols` as a LongType column:
    * bit i of dimension d lands at position i * dims + d, so equal
    * prefixes mean nearby cells in every dimension. Pure bit
    * arithmetic on the bucket ids — whole-stage codegen keeps this in
    * the compaction scan. */
  def zcol(cols: Seq[String], bnds: Map[String, Array[Double]],
      bits: Int): Column = {
    val dims = cols.size
    // Java shifts mask the amount mod 64: a position ≥ 64 would
    // silently alias onto a low bit and corrupt the curve — refuse
    require(dims * bits <= 64,
      s"zorder: $dims dims × $bits bits = ${dims * bits} interleaved " +
        "bits exceed one long (64) — lower bits or cluster fewer columns")
    val ids = cols.map(c => bucketId(col(c), bnds(c)).cast("long"))
    val terms = for {
      (id, d) <- ids.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(id, i).bitwiseAND(1L), i * dims + d)
    terms.reduce(_.bitwiseOR(_))
  }
}
