package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** OLAP shapes beyond the reference's surface: range joins, rollups,
  * pivots, sketches — the analytics layer a warehouse user expects.
  */
object Analytics {

  // --------------------------------------------------------------- q34
  /** Range (non-equi) join: events against a derived table of 6-hour
    * intervals. The interval side is tiny and broadcast — the plan is
    * BroadcastNestedLoopJoin with the range predicate evaluated in
    * codegen, which is exactly right when one side is bounded; a
    * fact-fact range join would instead bucket both sides by coarse
    * time and equi-join the bucket first (bounded fan-out). */
  def q34RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    // deterministic interval table: 6-hour buckets over January 2024
    val buckets = spark.range(0, 124).toDF("bucket_id")
      .withColumn("start_us",
        lit(1704067200000000L) + col("bucket_id") * lit(21600000000L))
      .withColumn("end_us", col("start_us") + lit(21600000000L))
    Tables(spark, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts")))
      .join(broadcast(buckets),
        col("ts_us") >= col("start_us") && col("ts_us") < col("end_us"))
      .groupBy(col("bucket_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .orderBy(col("bucket_id"))
  }

  // --------------------------------------------------------------- q35
  /** Rollup: revenue at (region, nation), (region), and grand-total
    * levels in one pass — Catalyst expands to a single Expand+Agg. */
  def q35Rollup(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")
    val nation = Tables(spark, dir, "nation")
    val region = Tables(spark, dir, "region")
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        sum(col("o_totalprice").cast(DecimalType(28, 2))).cast(DoubleType)
          .as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  // --------------------------------------------------------------- q49
  /** GROUPING SETS — the general form [[q35Rollup]]'s hierarchy can't
    * express: region×status, region, status, and grand total in ONE
    * pass (one Expand + one aggregate; four separate GROUP BYs would
    * scan and shuffle four times). `grouping_id` disambiguates a
    * subtotal row from a genuinely-null key (both engines use the
    * leftmost-column-is-MSB bit encoding). */
  def q49GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")
    val nation = Tables(spark, dir, "nation")
    val region = Tables(spark, dir, "region")
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupingSets(
        Seq(Seq(col("r_name"), col("o_orderstatus")), Seq(col("r_name")),
          Seq(col("o_orderstatus")), Seq.empty),
        col("r_name"), col("o_orderstatus"))
      .agg(
        grouping_id().cast("int").as("gid"),
        sum(col("o_totalprice").cast(DecimalType(28, 2))).cast(DoubleType)
          .as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("gid"), col("r_name").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)
  }

  // --------------------------------------------------------------- q36
  /** Pivot: per-user event-type counts as columns (fixed type list so
    * the schema is static — dynamic pivot would need a pre-pass). */
  def q36Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_id"))

  // --------------------------------------------------------------- q37
  /** Sketches: HyperLogLog distinct + approximate quantiles. Engine-
    * specific estimators → rows-only check; AnalyticsSpec bounds the
    * error against exact answers (<5% rel. for HLL at default rsd).
    * The deterministic subset (exact counts, exact discrete quantiles)
    * is oracle-hash-checked separately as [[q37aSketchExact]]. */
  def q37Sketches(spark: SparkSession, dir: String): DataFrame = {
    // sketch updates (HLL registers, quantile buffers) are scan-stage
    // CPU — spread the single-file scan (no-op on a real cluster)
    val l = graft.operators.Spread.byKey(
        Tables(spark, dir, "lineitem"), col("l_orderkey"))
      .select(col("l_returnflag"), col("l_orderkey"), col("l_extendedprice"))
    // exact distinct SPLIT OUT of the sketch aggregate (r21): mixing
    // countDistinct with non-distinct aggregates makes the rewrite
    // key its FIRST aggregate by (flag, l_orderkey) — the HLL and
    // quantile buffers get built, merged, and SHUFFLED once per
    // distinct ORDER (~600k sketch states) instead of once per flag
    // (3). Two lean aggregates joined on the 3-row group key measure
    // 14.7 s (r20, serial) → 4.4 s (spread) → 1.2 s (spread + this
    // split). Same values, same columns, same order.
    val sketches = l.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("approx_median_price"))
    val exact = l.select(col("l_returnflag"), col("l_orderkey")).distinct()
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("exact_orders"))
    sketches.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("approx_orders"),
        col("exact_orders"), col("approx_median_price"))
      .orderBy(col("l_returnflag"))
  }

  // --------------------------------------------------------------- q37a
  /** The deterministic companion to [[q37Sketches]]: everything in the
    * sketch query that HAS an exact answer — row counts, exact distinct
    * counts, and discrete (type-1) quantiles defined explicitly as the
    * value at 1-based sorted position `ceil(p*n)` — expressed with the
    * SAME window+conditional-aggregate shape in both engines, so the
    * oracle hash-checks it. Only the HLL/approx-percentile sketch
    * INTERNALS stay rows-only in q37 (engine-specific estimators);
    * AnalyticsSpec bounds their error against these exact answers.
    *
    * Scale shape — the histogram form, NOT a per-row rank window: a
    * window partitioned by l_returnflag (3 distinct values) would sort
    * a third of the table on ONE task at 100 TB. Instead rows collapse
    * to distinct (flag, price) COUNTS first (partial-agg shuffle, the
    * same cost as any groupBy), and the cumulative-count window runs
    * over that compressed value table (|distinct prices| rows, orders
    * of magnitude smaller than the fact table). The quantile is then
    * the MIN value whose cumulative count reaches position ceil(p*n) —
    * exactly the value at that position in the sorted multiset, with
    * ties collapsing naturally (equal values share one histogram row).
    * At 100 TB you still usually run q37's one-pass mergeable sketches;
    * this is the exactness gate, and it scales too. */
  def q37aSketchExact(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    val hist = l.groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_extendedprice"))))
      .withColumn("n",
        sum(col("c")).over(Window.partitionBy(col("l_returnflag"))))
    def atQ(p: Double) =
      min(when(col("cum") >= ceil(col("n") * lit(p)), col("l_extendedprice")))
    val quantiles = hist.groupBy(col("l_returnflag"))
      .agg(
        atQ(0.25).as("p25_price"),
        atQ(0.50).as("median_price"),
        atQ(0.75).as("p75_price"))
    l.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .join(quantiles, "l_returnflag")
      .select(col("l_returnflag"), col("n_rows"), col("exact_orders"),
        col("p25_price"), col("median_price"), col("p75_price"))
      .orderBy(col("l_returnflag"))
  }

  // --------------------------------------------------------------- q50
  /** Second-moment statistics (stddev, correlation) with cross-engine
    * bit-exactness: built-in `corr`/`stddev` aggregate DOUBLES in
    * combine order (non-deterministic last ulp across partitionings),
    * so the moments are accumulated as exact DECIMAL sums — order-
    * independent — and the statistics derive from them in one fixed
    * IEEE expression both engines evaluate identically. The same
    * one-pass sufficient-statistics shape a 100 TB profiler uses
    * (never two passes for mean-then-variance). */
  def q50Stats(spark: SparkSession, dir: String): DataFrame = {
    val l = graft.operators.Spread.byKey(Tables(spark, dir, "lineitem"), col("l_orderkey"))
    val q = col("l_quantity").cast(DecimalType(12, 2))
    val p = col("l_extendedprice").cast(DecimalType(18, 2))
    val agg = l.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(q).as("sq"), sum(p).as("sp"),
        sum(q * q).as("sqq"), sum(p * p).as("spp"),
        sum(q * p).as("sqp"))
    val nD = col("n").cast(DoubleType)
    def d(c: String) = col(c).cast(DoubleType)
    agg.select(
      col("l_returnflag"),
      col("n"),
      (d("sq") / nD).as("avg_qty"),
      sqrt((nD * d("sqq") - d("sq") * d("sq")) / (nD * (nD - lit(1.0))))
        .as("stddev_qty"),
      sqrt((nD * d("spp") - d("sp") * d("sp")) / (nD * (nD - lit(1.0))))
        .as("stddev_price"),
      ((nD * d("sqp") - d("sq") * d("sp")) /
        (sqrt(nD * d("sqq") - d("sq") * d("sq")) *
         sqrt(nD * d("spp") - d("sp") * d("sp")))).as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  // --------------------------------------------------------------- q70
  /** Distribution drift per source: total-variation distance between
    * each source's document-length histogram and the corpus-wide one —
    * the slice-vs-whole comparison a data pipeline runs to catch a
    * crawler/source whose content shifted (new template, truncation
    * bug, language flip) before it pollutes a training mixture.
    *
    * Cross-engine exactness: TVD's inner term |n_sb/N_s − n_b/N| is
    * rescaled to the all-integer |n_sb·N − n_b·N_s| (DECIMAL(19,0)
    * products, exact per-term), summed exactly, and divided out in ONE
    * fixed IEEE expression both engines evaluate identically — the
    * [[q50Stats]] discipline applied to a distribution distance. The
    * summed numerator is bounded by 2·N_s·N, so the DECIMAL(38,0)
    * accumulator is exact while 2·N_s·N < 10^38 — i.e. any corpus
    * under ~7×10^18 documents, comfortably past BIGINT-count reality;
    * beyond that bound Spark's non-ANSI decimal sum would return NULL
    * where DuckDB raises, so the divergence mode is loud-vs-null, not
    * silently wrong values.
    *
    * Scale shape: one (source, bucket) partial+final aggregate over
    * the corpus (the only full-data shuffle), then everything runs on
    * the tiny histogram: the cell table is `localCheckpoint`'d — the
    * marginals, grid, and left join are FOUR consumers, and without
    * the cut Catalyst re-derives each from the source, scanning the
    * corpus four times — marginals are re-aggregates of the cell
    * table, the source×bucket grid is a crossJoin of two broadcast
    * frames, and missing cells materialize as 0 via the left join —
    * per-source sums never touch the raw rows again. */
  def q70SourceDrift(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(19, 0)
    val d = Tables(spark, dir, "documents")
      .select(col("source"), expr("n_chars div 100").as("bucket"))
    val cell = d.groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_sb"))
      .localCheckpoint()
    val bySource = cell.groupBy(col("source")).agg(sum(col("n_sb")).as("n_s"))
    val byBucket = cell.groupBy(col("bucket")).agg(sum(col("n_sb")).as("n_b"))
    val total = cell.agg(sum(col("n_sb")).as("n_total"))
    val grid = bySource.crossJoin(broadcast(byBucket))
      .join(cell, Seq("source", "bucket"), "left")
      .na.fill(0L, Seq("n_sb"))
      .crossJoin(broadcast(total))
    val diff = abs(
      col("n_sb").cast(dec) * col("n_total").cast(dec) -
        col("n_b").cast(dec) * col("n_s").cast(dec))
    grid.groupBy(col("source"), col("n_s"), col("n_total"))
      .agg(sum(diff).as("num"))
      .select(col("source"), col("n_s").as("n_docs"),
        (col("num").cast(DoubleType) /
          (lit(2.0) * col("n_s").cast(DoubleType) *
            col("n_total").cast(DoubleType))).as("tvd"))
      .orderBy(col("source"))
  }

  // --------------------------------------------------------------- q89
  /** Per-group winsorization (robust-stats clamp at the exact 5th/95th
    * percentiles): outliers are not dropped (q62) but clamped to the
    * cut values — the standard robust mean/total when extreme values
    * are suspect but mass must be conserved.
    *
    * Cross-engine exactness: the percentile is the q77 integer-cut
    * idiom — the k = ⌈p·n⌉-th smallest value via `20·rank ≤ n + 19`
    * (p=1/20) and `20·rank ≤ 19·n + 19` (p=19/20) — row_number ties
    * permute only inside equal values, so the cut VALUE is
    * deterministic; the clamp is `least/greatest` on doubles and the
    * winsorized total follows q1's decimal-sum recipe.
    *
    * Scale shape: one window sort per group computes rank and n in the
    * same partitioning (one exchange); the ranked frame is
    * materialized so cut extraction and the final clamp-aggregate
    * reuse it instead of re-sorting; cut values (one row per group)
    * broadcast back. Exact per-group quantiles cost a per-group sort
    * at any engine — at 100 TB swap in the q37 sketch percentiles if
    * ±ε is acceptable; this operator is the exact path. */
  def q89Winsorize(spark: SparkSession, dir: String): DataFrame = {
    val byG = Window.partitionBy(col("g"))
    val ranked = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
      .withColumn("rk", row_number().over(byG.orderBy(col("x"))).cast("long"))
      .withColumn("n", count(lit(1)).over(byG))
      .localCheckpoint() // two consumers: cut extraction + clamp agg
    val cuts = ranked.groupBy(col("g")).agg(
      max(when(col("rk") * 20 <= col("n") + 19, col("x"))).as("v_low"),
      max(when(col("rk") * 20 <= col("n") * 19 + 19, col("x"))).as("v_high"))
    val clamped = greatest(least(col("x"), col("v_high")), col("v_low"))
    ranked.join(broadcast(cuts), "g")
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("n"),
        first(col("v_low")).as("v_low"),
        first(col("v_high")).as("v_high"),
        count(when(col("x") < col("v_low"), 1)).as("n_clamped_low"),
        count(when(col("x") > col("v_high"), 1)).as("n_clamped_high"),
        sum(clamped.cast(DecimalType(28, 2))).cast(DoubleType)
          .as("sum_winsorized"))
      .orderBy(col("g"))
  }

  // --------------------------------------------------------------- q98
  /** Robust per-source document-length gate: median + MAD (median
    * absolute deviation) with the outlier flag `|x − med| > 3·MAD` —
    * the robust complement to q62's z-score (mean/stddev are
    * themselves dragged by the outliers they're meant to catch; a
    * handful of giant crawl artifacts inflates σ until nothing flags,
    * while the median/MAD pair is 50%-breakdown robust — Hampel's
    * classic identifier). Per-source, because length distributions
    * are source-shaped (code vs chat vs web).
    *
    * Cross-engine exactness: both quantiles use the q77/q89 integer
    * rank cut (value at rank ceil(n/2): `2·rk ≤ n+1` — the LOWER
    * median, no float interpolation ever), deviations and the 3·MAD
    * comparison are pure BIGINT. A 50%-duplicate source makes
    * MAD = 0 — then ANY deviation flags, the documented degenerate
    * contract (evidence the source needs dedup before gating).
    *
    * Scale shape: q89's — one window sort per source computes rank
    * and n together; the one-row-per-source cuts broadcast back; the
    * second (deviation) ranking reuses the same source partitioning.
    * Output is ≤ |sources| rows. */
  def q98MadGate(spark: SparkSession, dir: String): DataFrame = {
    val byS = Window.partitionBy(col("source"))
    val ranked = Tables(spark, dir, "documents")
      .select(col("source"), col("n_chars").cast("long").as("x"))
      .withColumn("rk", row_number().over(byS.orderBy(col("x"))).cast("long"))
      .withColumn("n", count(lit(1)).over(byS))
      .localCheckpoint() // two consumers: median cut + deviation join
    val med = ranked.groupBy(col("source")).agg(
      max(when(col("rk") * 2 <= col("n") + 1, col("x"))).as("med"))
    val ranked2 = ranked.join(broadcast(med), "source")
      .withColumn("ad", abs(col("x") - col("med")))
      .withColumn("rk2", row_number().over(byS.orderBy(col("ad"))).cast("long"))
      .localCheckpoint() // two consumers: MAD cut + final rollup
    val mad = ranked2.groupBy(col("source")).agg(
      max(when(col("rk2") * 2 <= col("n") + 1, col("ad"))).as("mad"))
    ranked2.join(broadcast(mad), "source")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        first(col("med")).as("med_chars"),
        first(col("mad")).as("mad_chars"),
        count(when(col("ad") > col("mad") * 3, 1)).as("n_outliers"))
      .orderBy(col("source"))
  }

  // --------------------------------------------------------------- q109
  /** KMV distinct-count sketch per source — the deterministic,
    * oracle-checkable cousin of q37's HLL, as a native
    * [[graft.functions.KmvSketch]] TypedImperativeAggregate: O(k)
    * state per group, map-side partial aggregation, commutative merge
    * — the shuffle carries ≤k longs per group, never the value stream.
    * The hash is the md5-prefix long (uniform on [0, 2^32), the same
    * engine-neutral key family as the md5-uniform splits), so DuckDB
    * replays the whole sketch exactly: `ROW_NUMBER() ≤ k` per source.
    * Estimate: the unbiased (k−1)/h(k) on the normalized k-th minimum
    * (one exactly-rounded double division — hash-stable); sources with
    * fewer than k distinct values report their exact count. */
  val KmvK = 16
  def q109KmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val hash = conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
    Tables(spark, dir, "documents")
      .select(col("source"), hash.as("hk"))
      .groupBy(col("source"))
      .agg(
        graft.functions.KmvSketch.kmvSketch(col("hk"), KmvK).as("mins"),
        countDistinct(col("hk")).as("exact_distinct"),
        count(lit(1)).as("n_docs"))
      .select(
        col("source"), col("n_docs"), col("exact_distinct"),
        when(size(col("mins")) < KmvK, size(col("mins")).cast("double"))
          // (k−1)·2^32 precomputed as ONE literal so both engines do a
          // single division, never a re-associable multiply chain
          .otherwise(lit(64424509440.0) /
            element_at(col("mins"), KmvK).cast("double"))
          .as("est_distinct"))
      .orderBy(col("source"))
  }

  // --------------------------------------------------------------- q112
  /** q109's KMV sketch composed with ROLLUP: per-source AND
    * corpus-total distinct estimates in ONE pass over the data — the
    * cube-with-sketches pattern. This is exactly what a mergeable
    * sketch buys at scale: the total is the MERGE of the per-source
    * partials (Spark's rollup does it in the aggregation tree, ≤k
    * longs per level), where an exact countDistinct would re-shuffle
    * the value stream per grouping level. The corpus total also
    * exercises the estimator against real duplication (distinct texts
    * < total docs), which per-source groups at this sf barely do. */
  def q112KmvRollup(spark: SparkSession, dir: String): DataFrame = {
    val hash = conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
    Tables(spark, dir, "documents")
      .select(col("source"), hash.as("hk"))
      .rollup(col("source"))
      .agg(
        graft.functions.KmvSketch.kmvSketch(col("hk"), KmvK).as("mins"),
        countDistinct(col("hk")).as("exact_distinct"),
        count(lit(1)).as("n_docs"),
        // grouping() tags the rollup-total LEVEL (it must be computed
        // inside the Aggregate), so a NULL source group — or a source
        // literally named "(all)" — can never collide with the
        // corpus-total row; matches the oracle's UNION ALL replay,
        // where NULL sources stay NULL at the per-source level
        grouping(col("source")).as("_lvl"))
      .select(
        when(col("_lvl") === 1, lit("(all)"))
          .otherwise(col("source")).as("scope"),
        col("n_docs"), col("exact_distinct"),
        when(size(col("mins")) < KmvK, size(col("mins")).cast("double"))
          .otherwise(lit(64424509440.0) /
            element_at(col("mins"), KmvK).cast("double"))
          .as("est_distinct"))
      .orderBy(col("scope"))
  }

  // --------------------------------------------------------------- q116
  /** Count-Min heavy-hitter check — [[graft.functions.CmsSketch]]
    * (Cormode–Muthukrishnan) aggregated over the corpus token stream in
    * ONE pass, then the 10 highest-frequency tokens scored against it:
    * `est = min over depth rows of counters[row][bucket_row(token)]`.
    * Output per token: exact count, sketch estimate (≥ exact by the CM
    * one-sided guarantee — collisions only ever over-count), and the
    * stream length.
    *
    * Why it earns a row next to exact q48: at 100 TB the exact top-K
    * needs a full (token → count) shuffle — fine for one vocabulary
    * build, wrong for a RECURRING frequency probe (stopword drift
    * monitoring, block-list hit rates). The sketch is O(depth·width)
    * state per group with elementwise-add merge, so the shuffle carries
    * one 16 KB matrix instead of the token stream, and sketches from
    * disjoint corpus shards / streaming micro-batches merge exactly.
    * Buckets come from four non-overlapping 8-hex-digit slices of one
    * md5 per token, so DuckDB replays every counter (COUNT(*) per
    * bucket) and every estimate (MIN over rows) bit-for-bit — this is
    * the engine-neutral-hash discipline that got q109's KMV a full
    * hash check where HLL can only manage rows-only. */
  val CmsDepth = 4
  val CmsWidth = 512
  private def cmsBucket(r: Int, tok: org.apache.spark.sql.Column) =
    conv(substring(md5(tok), 1 + 8 * r, 8), 16, 10).cast("long") % CmsWidth
  def q116CmsTopk(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.operators.Spread.byKey(Tables(spark, dir, "documents"), col("doc_id"))
      .select(explode(split(col("text"), "\\s+")).as("token"))
    val sketch = toks
      .select(array((0 until CmsDepth).map(r => cmsBucket(r, col("token"))): _*)
        .as("bkts"))
      .agg(
        graft.functions.CmsSketch.cmsSketch(col("bkts"), CmsDepth, CmsWidth)
          .as("cms"),
        count(lit(1)).as("n_tokens_total"))
    val top = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("token")).limit(10)
    // 10 × 1-row sketch: the bounded-crossJoin pattern (see q37a/q62)
    top.crossJoin(broadcast(sketch))
      .select(
        col("token"), col("exact_cnt"),
        least((0 until CmsDepth).map(r =>
          element_at(col("cms"),
            (lit(r * CmsWidth + 1) + cmsBucket(r, col("token"))).cast("int")))
          : _*).as("est_cnt"),
        col("n_tokens_total"))
      .orderBy(col("exact_cnt").desc, col("token"))
  }

  // --------------------------------------------------------------- q117
  /** Incremental maintenance of the corpus CMS over a VERSIONED lake —
    * the q113/q114/q115 composition applied to aggregate STATE instead
    * of a row-set index. Those three maintain set-algebra artifacts
    * (distinct-union, append, frozen-centroid append); a Count-Min
    * sketch is a LINEAR sketch, so its maintenance law is plain
    * addition: `cms(v) = cms(v−1) + cms(delta v−1→v)` — elementwise,
    * exact, no distinct pass, no fold-in order to get wrong. That is
    * the property that makes a standing frequency monitor (stopword
    * drift, block-list hit rates — q116's posture) affordable under a
    * daily ingest at 100 TB: each version costs one map-only pass over
    * DELTA tokens plus a 16 KB array add, never a corpus re-scan (the
    * spec asserts the maintenance frame's input files are the previous
    * artifact + the change table only). Removals would need a negative
    * delta — which the SAME law supports (counters subtract), unlike
    * the set-union indexes, where removal needs tombstones.
    *
    * Output: the nonzero counters of version 2's sketch as (r, bkt, c)
    * rows. The oracle rebuilds every counter from the FULL corpus
    * (COUNT(*) per md5-slice bucket — q116's replay), so hash equality
    * proves the incremental chain lands on exactly the from-scratch
    * sketch. */
  def q117IncrCms(spark: SparkSession, dir: String): DataFrame = {
    val base = Dedup.versionedCorpus(spark, dir)
    cmsAt(spark, base, 1L) // ensure v1's artifact exists (cached)
    cmsAt(spark, base, 2L) // the incremental add
      .select(posexplode(col("cms")).as(Seq("pos", "c")))
      .filter(col("c") > 0)
      .select(
        floor(col("pos") / CmsWidth).cast("long").as("r"),
        (col("pos") % CmsWidth).cast("long").as("bkt"),
        col("c"))
      .orderBy(col("r"), col("bkt"))
  }

  // --------------------------------------------------------------- q127
  /** Exact CMS TOMBSTONE SUBTRACTION — the removal direction for the
    * sketch family, exercised where the linear-sketch algebra makes it
    * exact: a third lake version publishes `documents_removed`
    * CARRYING THE REMOVED TEXT (the takedown-batch contract — see
    * [[TextOps.versionedCorpusWithRemoval]]), and the chain subtracts
    * the tombstone batch's sketch counter-for-counter instead of
    * re-sketching the surviving corpus. The oracle rebuilds every
    * counter from the SURVIVORS only (q117's md5-slice COUNT(*)
    * replay over the post-removal corpus), so hash equality proves
    * `cms(prev) + cms(Δ) − cms(R) ≡ cms(corpus ∖ R)` — removal
    * through the sketch chain is indistinguishable from never having
    * ingested the removed docs, at 16 KB of maintenance I/O. Output
    * shape = q117's nonzero (r, bkt, c) rows. */
  def q127CmsSubtract(spark: SparkSession, dir: String): DataFrame = {
    val base = TextOps.versionedCorpusWithRemoval(spark, dir)
    cmsAt(spark, base, 1L) // chain origin
    cmsAt(spark, base, 2L) // delta add
    cmsAt(spark, base, 3L) // the tombstone subtract
      .select(posexplode(col("cms")).as(Seq("pos", "c")))
      .filter(col("c") > 0)
      .select(
        floor(col("pos") / CmsWidth).cast("long").as("r"),
        (col("pos") % CmsWidth).cast("long").as("bkt"),
        col("c"))
      .orderBy(col("r"), col("bkt"))
  }

  /** One-pass CMS of `docsDf`'s whitespace-token stream: a 1-row frame
    * with the flattened depth×width counter matrix (q116's sketch
    * side, factored out so the batch query, the incremental
    * maintenance, and the spec all share one definition). */
  private[graft] def cmsOf(docsDf: DataFrame): DataFrame =
    docsDf
      .select(explode(split(col("text"), "\\s+")).as("token"))
      .select(array((0 until CmsDepth).map(r => cmsBucket(r, col("token"))): _*)
        .as("bkts"))
      .agg(graft.functions.CmsSketch.cmsSketch(col("bkts"), CmsDepth, CmsWidth)
        .as("cms"))

  /** Artifact path for the corpus sketch of lake version `v` —
    * parameter-keyed like the `win-` family so a depth/width change
    * can never reuse a stale matrix. */
  private[graft] def cmsArtifact(lakeBase: String, v: Long): String =
    s"$lakeBase-cms$CmsDepth-w$CmsWidth-v$v"

  /** The corpus CMS AT lake version `v`, incrementally maintained
    * ([[q117IncrCms]]'s engine). */
  private[graft] def cmsAt(spark: SparkSession, lakeBase: String, v: Long)
      : DataFrame =
    graft.sources.ArtifactStore.readOrPublish(
      spark, cmsArtifact(lakeBase, v))(
      incrementalCmsFrame(spark, lakeBase, v))

  /** Maintenance frame behind [[cmsAt]]: previous artifact present ⇒
    * elementwise-ADD the delta's sketch and, when the version's
    * tombstone table carries the removed docs' TEXT, elementwise-
    * SUBTRACT the tombstone batch's sketch — both 1-row broadcasts,
    * both exact because the CMS is a linear map of the token stream:
    * `cms(corpus ∖ R) = cms(corpus) − cms(R)` counter-for-counter
    * when R's docs were ingested verbatim (the removal contract —
    * q127 proves subtract ≡ rebuild-over-survivors, and a violated
    * contract shows up as a negative counter, which the spec checks
    * for). A tombstone table WITHOUT text still forces the full
    * rebuild: the subtrahend would need the previous version's rows,
    * which lake GC may have collected by maintenance time — the
    * never-silently-over-count guard, same fallback discipline as
    * [[Dedup.incrementalWindowFrame]]. */
  private[graft] def incrementalCmsFrame(spark: SparkSession,
      lakeBase: String, v: Long): DataFrame = {
    import graft.sources.{ArtifactStore, Versioned}
    val hasDelta =
      Versioned.tableExists(spark, lakeBase, "documents_delta", v)
    val hasRemoved =
      Versioned.tableExists(spark, lakeBase, "documents_removed", v)
    lazy val removed = Versioned.readAt(spark, lakeBase, "documents_removed", v)
    val removedWithText = hasRemoved && removed.columns.contains("text")
    ArtifactStore.readIfPresent(spark, cmsArtifact(lakeBase, v - 1)) match {
      case Some(prev)
          if (hasDelta || removedWithText) && (!hasRemoved || removedWithText) =>
        val added = if (hasDelta)
          prev.crossJoin(broadcast(
            cmsOf(Versioned.readAt(spark, lakeBase, "documents_delta", v))
              .withColumnRenamed("cms", "cms_delta")))
            .select(zip_with(col("cms"), col("cms_delta"),
              (a, b) => a + b).as("cms"))
        else prev
        if (removedWithText)
          added.crossJoin(broadcast(
            cmsOf(removed).withColumnRenamed("cms", "cms_rm")))
            .select(zip_with(col("cms"), col("cms_rm"),
              (a, b) => a - b).as("cms"))
        else added
      case _ => cmsOf(Versioned.readAt(spark, lakeBase, "documents", v))
    }
  }

  // --------------------------------------------------------------- q118
  /** The per-source KMV sketch table (q109's aggregation without the
    * estimate projection) — factored out so q118 can checkpoint it and
    * PlanSpec can pin the map-side `partial_kmv_sketch` on the
    * un-checkpointed frame. One corpus scan; ≤k longs per source cross
    * the exchange. */
  private[graft] def kmvSourceSketches(spark: SparkSession, dir: String)
      : DataFrame = kmvSketchOf(Tables(spark, dir, "documents"))

  /** Per-source KMV sketch (+ row count) of any documents frame — one
    * definition shared by the batch query, the pairwise composition
    * (q118), and the version maintenance (q120). */
  private[graft] def kmvSketchOf(docsDf: DataFrame): DataFrame = {
    val hash = conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
    docsDf
      .select(col("source"), hash.as("hk"))
      .groupBy(col("source"))
      .agg(
        graft.functions.KmvSketch.kmvSketch(col("hk"), KmvK).as("mins"),
        count(lit(1)).as("n_docs"))
  }

  /** Cross-source overlap estimation composed from per-source KMV
    * sketches — the sketch SET ALGEBRA that makes q109 more than a
    * counter (Beyer et al., SIGMOD 2007 §5). For every source pair:
    * the bottom-k of the UNION of the two sketches — valid because
    * bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)), the KMV
    * mergeability identity — the count `common_k` of union-survivors
    * present in BOTH sketches (the Jaccard estimator's numerator), and
    * the derived distinct-union / Jaccard / intersection estimates.
    * This is the mixture-planning input — "how much does source X
    * duplicate source Y" — computed WITHOUT a pairwise doc- or
    * token-level shuffle: the corpus is scanned ONCE (map-side partial
    * sketches), and the composition runs over S(S−1)/2 rows of
    * k-length arrays — codebook-scale, never corpus-scale. The exact
    * alternative is a corpus-sized distinct-intersection shuffle PER
    * PAIR; at 100 TB with tens of sources that is the difference
    * between one scan and hundreds.
    *
    * Every estimate is hash-stable cross-engine: a union sketch that
    * is not full (u < k) IS the exact union, so `common_k` is the
    * exact intersection and the "estimates" are exact; a full one uses
    * union_est = (k−1)·2^32 / h(k) (single exactly-rounded division,
    * q109's idiom), jaccard_est = common_k / u (u = k, a power of two
    * ⇒ exact dyadic), and inter_est = jaccard·union computed as ONE
    * division of exactly-representable longs —
    * (common_k·(k−1)·2^32) / (k·h(k)), numerator ≤ 16·15·2^32 < 2^53
    * — so both engines round once, identically. */
  def q118KmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    // one corpus scan; the S-row sketch table feeds both join sides
    val sk = kmvSourceSketches(spark, dir).localCheckpoint()
    val pairs = sk.select(col("source").as("src_a"), col("mins").as("amins"))
      .join(sk.select(col("source").as("src_b"), col("mins").as("bmins")),
        col("src_a") < col("src_b"))
    val enriched = pairs
      .withColumn("u",
        slice(array_sort(array_union(col("amins"), col("bmins"))), 1, KmvK))
      .withColumn("common_k",
        size(filter(col("u"), x =>
          array_contains(col("amins"), x) &&
            array_contains(col("bmins"), x))).cast("long"))
      .withColumn("union_k", size(col("u")).cast("long"))
    enriched.select(
      col("src_a"), col("src_b"), col("common_k"), col("union_k"),
      when(col("union_k") < KmvK, col("union_k").cast("double"))
        .otherwise(lit(64424509440.0) /
          element_at(col("u"), KmvK).cast("double")).as("union_est"),
      (col("common_k").cast("double") / col("union_k").cast("double"))
        .as("jaccard_est"),
      when(col("union_k") < KmvK, col("common_k").cast("double"))
        .otherwise((col("common_k") * lit(64424509440L)).cast("double") /
          (lit(KmvK.toLong) * element_at(col("u"), KmvK)).cast("double"))
        .as("inter_est"))
      .orderBy(col("src_a"), col("src_b"))
  }

  // --------------------------------------------------------------- q120
  /** Incremental maintenance of the per-source KMV sketches over the
    * versioned lake — the distinct-count sibling of q117's CMS chain,
    * completing the sketch-maintenance symmetry: a CMS is LINEAR (its
    * maintenance law is elementwise add), a KMV is a SET sketch (its
    * law is the bottom-k merge — the same mergeability identity that
    * powers q118's pairwise composition, here applied across VERSIONS
    * instead of across sources):
    * `kmv(v) = bottomk(kmv(v−1) ∪ sketch(delta v−1→v))`, per source,
    * as one full-outer join of two S-row sketch tables. Each version
    * therefore costs one map-only sketch pass over DELTA docs plus an
    * S-row array merge — never a corpus re-scan (file-exact in the
    * spec) — and the maintained artifact serves q109-style
    * distinct-count probes AND q118-style overlap probes at any
    * version. Append-only like the rest of the set-union family;
    * removals would need re-sketching (a KMV cannot subtract), which
    * is exactly why the CMS twin exists for frequencies.
    *
    * Output: q109's shape (minus the exact-count evidence column,
    * which is not sketch-maintainable and exists in q109 only as
    * test evidence). The oracle rebuilds every estimate from the FULL
    * corpus, so hash equality proves the chain lands on exactly the
    * from-scratch sketches. */
  def q120IncrKmv(spark: SparkSession, dir: String): DataFrame = {
    val base = Dedup.versionedCorpus(spark, dir)
    kmvAt(spark, base, 1L) // ensure v1's artifact exists (cached)
    kmvAt(spark, base, 2L) // the incremental bottom-k merge
      .select(
        col("source"), col("n_docs"),
        when(size(col("mins")) < KmvK, size(col("mins")).cast("double"))
          .otherwise(lit(64424509440.0) /
            element_at(col("mins"), KmvK).cast("double"))
          .as("est_distinct"))
      .orderBy(col("source"))
  }

  private[graft] def kmvArtifact(lakeBase: String, v: Long): String =
    s"$lakeBase-kmv$KmvK-v$v"

  /** The per-source sketch table AT lake version `v`, incrementally
    * maintained ([[q120IncrKmv]]'s engine). */
  private[graft] def kmvAt(spark: SparkSession, lakeBase: String, v: Long)
      : DataFrame =
    graft.sources.ArtifactStore.readOrPublish(
      spark, kmvArtifact(lakeBase, v))(
      incrementalKmvFrame(spark, lakeBase, v))

  /** Maintenance frame behind [[kmvAt]]: previous artifact present ⇒
    * sketch the delta and bottom-k-merge per source (full outer — a
    * brand-new source appears, an untouched one carries through);
    * absent ⇒ full build, the family's fallback discipline. */
  private[graft] def incrementalKmvFrame(spark: SparkSession,
      lakeBase: String, v: Long): DataFrame = {
    import graft.sources.{ArtifactStore, Versioned}
    val emptyMins = expr("CAST(array() AS ARRAY<BIGINT>)")
    ArtifactStore.readIfPresent(spark, kmvArtifact(lakeBase, v - 1)) match {
      // tombstones force the full rebuild: a KMV cannot subtract (a
      // removed doc's hash may be another doc's hash too), so
      // appending past a removal version would silently over-count
      case Some(prev)
          if Versioned.tableExists(spark, lakeBase, "documents_delta", v)
            && !Versioned.tableExists(
              spark, lakeBase, "documents_removed", v) =>
        val delta = kmvSketchOf(
          Versioned.readAt(spark, lakeBase, "documents_delta", v))
        prev.select(col("source"), col("mins").as("a"),
            col("n_docs").as("na"))
          .join(delta.select(col("source"), col("mins").as("b"),
            col("n_docs").as("nb")), Seq("source"), "full_outer")
          .select(
            col("source"),
            slice(array_sort(array_union(
              coalesce(col("a"), emptyMins),
              coalesce(col("b"), emptyMins))), 1, KmvK).as("mins"),
            (coalesce(col("na"), lit(0L)) + coalesce(col("nb"), lit(0L)))
              .as("n_docs"))
      case _ => kmvSketchOf(Versioned.readAt(spark, lakeBase, "documents", v))
    }
  }

  // --------------------------------------------------------------- q125
  /** Cross-version frequency drift from the MAINTAINED sketch chain
    * alone — the monitoring payoff of q117: "how much did each heavy
    * token grow in the last ingest" answered by probing the two
    * versions' Count-Min artifacts (two 16 KB reads), never by
    * re-shuffling either version's token stream. The probe set is the
    * current corpus's exact top-10 (q116's derivation — one pass, the
    * recurring cost a drift monitor already pays); each token reports
    * its estimate under v1's and v2's sketches and the delta. Counter
    * monotonicity under the chain's elementwise add makes
    * `est_v2 ≥ est_v1` an invariant (asserted in the spec), and the
    * CM one-sided guarantee makes `est_v2 ≥ exact_cnt`; both MIN-over-
    * rows estimates replay bit-exactly in the oracle, v1's over the
    * standing split's counters. */
  def q125VersionDrift(spark: SparkSession, dir: String): DataFrame = {
    val base = Dedup.versionedCorpus(spark, dir)
    val s1 = cmsAt(spark, base, 1L).select(col("cms").as("cms1"))
    val s2 = cmsAt(spark, base, 2L).select(col("cms").as("cms2"))
    val top = Tables(spark, dir, "documents")
      .select(explode(split(col("text"), "\\s+")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("token")).limit(10)
    def est(cmsCol: String) = least((0 until CmsDepth).map(r =>
      element_at(col(cmsCol),
        (lit(r * CmsWidth + 1) + cmsBucket(r, col("token"))).cast("int")))
      : _*)
    // 10 × two 1-row sketches: the bounded-crossJoin pattern
    top.crossJoin(broadcast(s1)).crossJoin(broadcast(s2))
      .select(col("token"), col("exact_cnt"),
        est("cms1").as("est_v1"), est("cms2").as("est_v2"),
        (est("cms2") - est("cms1")).as("est_delta"))
      .orderBy(col("exact_cnt").desc, col("token"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q98_mad_gate"   -> (q98MadGate _),
    "q89_winsorize"  -> (q89Winsorize _),
    "q70_source_drift" -> (q70SourceDrift _),
    "q50_stats"      -> (q50Stats _),
    "q34_range_join" -> (q34RangeJoin _),
    "q35_rollup"     -> (q35Rollup _),
    "q49_grouping_sets" -> (q49GroupingSets _),
    "q36_pivot"      -> (q36Pivot _),
    "q37_sketches"   -> (q37Sketches _),
    "q37a_sketch_exact" -> (q37aSketchExact _),
    "q109_kmv_distinct" -> (q109KmvDistinct _),
    "q112_kmv_rollup" -> (q112KmvRollup _),
    "q116_cms_topk" -> (q116CmsTopk _),
    "q117_incr_cms" -> (q117IncrCms _),
    "q127_cms_subtract" -> (q127CmsSubtract _),
    "q118_kmv_overlap" -> (q118KmvOverlap _),
    "q120_incr_kmv" -> (q120IncrKmv _),
    "q125_version_drift" -> (q125VersionDrift _))

  val oracle: Map[String, String] = Map(
    // q98: lower-median rank cut (2·rk ≤ n+1) twice — value then
    // absolute deviation — all BIGINT, no interpolation
    "q98_mad_gate" ->
      """WITH d AS (
        | SELECT source, CAST(n_chars AS BIGINT) AS x FROM documents),
        |r1 AS (
        | SELECT source, x,
        |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY x) AS rk,
        |  COUNT(*) OVER (PARTITION BY source) AS n
        | FROM d),
        |med AS (
        | SELECT source, MAX(CASE WHEN rk * 2 <= n + 1 THEN x END) AS med
        | FROM r1 GROUP BY source),
        |r2 AS (
        | SELECT r1.source, r1.x, r1.n, med.med,
        |  abs(r1.x - med.med) AS ad,
        |  ROW_NUMBER() OVER (PARTITION BY r1.source
        |                     ORDER BY abs(r1.x - med.med)) AS rk2
        | FROM r1 JOIN med USING (source)),
        |mad AS (
        | SELECT source, MAX(CASE WHEN rk2 * 2 <= n + 1 THEN ad END) AS mad
        | FROM r2 GROUP BY source)
        |SELECT r2.source,
        | CAST(COUNT(*) AS BIGINT) AS n_docs,
        | MAX(r2.med) AS med_chars,
        | MAX(mad.mad) AS mad_chars,
        | CAST(COUNT(CASE WHEN r2.ad > 3 * mad.mad THEN 1 END) AS BIGINT)
        |   AS n_outliers
        |FROM r2 JOIN mad USING (source)
        |GROUP BY r2.source
        |ORDER BY r2.source""".stripMargin,
    // q89: the q77 integer quantile cut, replayed with window ranks;
    // decimal-exact winsorized sum per the q1 recipe
    "q89_winsorize" ->
      """WITH r AS (
        | SELECT l_returnflag AS g, l_extendedprice AS x,
        |  ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |                     ORDER BY l_extendedprice) AS rk,
        |  COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        | FROM lineitem),
        |c AS (
        | SELECT g,
        |  MAX(CASE WHEN rk * 20 <= n + 19 THEN x END) AS v_low,
        |  MAX(CASE WHEN rk * 20 <= n * 19 + 19 THEN x END) AS v_high
        | FROM r GROUP BY g)
        |SELECT r.g, CAST(COUNT(*) AS BIGINT) AS n, v_low, v_high,
        | CAST(COUNT(CASE WHEN x < v_low THEN 1 END) AS BIGINT)
        |   AS n_clamped_low,
        | CAST(COUNT(CASE WHEN x > v_high THEN 1 END) AS BIGINT)
        |   AS n_clamped_high,
        | CAST(SUM(CAST(GREATEST(LEAST(x, v_high), v_low)
        |   AS DECIMAL(28,2))) AS DOUBLE) AS sum_winsorized
        |FROM r JOIN c ON c.g = r.g
        |GROUP BY r.g, v_low, v_high
        |ORDER BY r.g""".stripMargin,
    // same integer-rescaled TVD: |n_sb*N - n_b*N_s| in DECIMAL(19,0)
    // products (exact), summed exactly, ONE final IEEE division tree
    "q70_source_drift" ->
      """WITH d AS (
        | SELECT source, n_chars // 100 AS bucket FROM documents),
        |cell AS (
        | SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_sb
        | FROM d GROUP BY source, bucket),
        |bysrc AS (
        | SELECT source, CAST(SUM(n_sb) AS BIGINT) AS n_s
        | FROM cell GROUP BY source),
        |bybkt AS (
        | SELECT bucket, CAST(SUM(n_sb) AS BIGINT) AS n_b
        | FROM cell GROUP BY bucket),
        |tot AS (SELECT CAST(SUM(n_sb) AS BIGINT) AS n_total FROM cell),
        |grid AS (
        | SELECT s.source, s.n_s, b.bucket, b.n_b,
        |  COALESCE(c.n_sb, 0) AS n_sb, t.n_total
        | FROM bysrc s CROSS JOIN bybkt b
        | LEFT JOIN cell c ON c.source = s.source AND c.bucket = b.bucket
        | CROSS JOIN tot t)
        |SELECT source, n_s AS n_docs,
        | CAST(SUM(ABS(CAST(n_sb AS DECIMAL(19,0)) * CAST(n_total AS DECIMAL(19,0))
        |     - CAST(n_b AS DECIMAL(19,0)) * CAST(n_s AS DECIMAL(19,0)))) AS DOUBLE)
        |  / (2.0 * CAST(n_s AS DOUBLE) * CAST(n_total AS DOUBLE)) AS tvd
        |FROM grid GROUP BY source, n_s, n_total ORDER BY source""".stripMargin,
    // same explicit histogram definition both sides: discrete quantile
    // = MIN value whose cumulative count reaches 1-based sorted
    // position ceil(p*n); BIGINT*0.25 promotes to DOUBLE identically
    // in both engines, prices are raw parquet doubles
    "q37a_sketch_exact" ->
      """WITH hist AS (
        | SELECT l_returnflag, l_extendedprice, COUNT(*) AS c
        | FROM lineitem GROUP BY l_returnflag, l_extendedprice),
        |cum AS (
        | SELECT l_returnflag, l_extendedprice,
        |  SUM(c) OVER (PARTITION BY l_returnflag
        |               ORDER BY l_extendedprice) AS cum,
        |  SUM(c) OVER (PARTITION BY l_returnflag) AS n
        | FROM hist),
        |q AS (
        | SELECT l_returnflag,
        |  MIN(CASE WHEN cum >= ceil(n * 0.25)
        |           THEN l_extendedprice END) AS p25_price,
        |  MIN(CASE WHEN cum >= ceil(n * 0.50)
        |           THEN l_extendedprice END) AS median_price,
        |  MIN(CASE WHEN cum >= ceil(n * 0.75)
        |           THEN l_extendedprice END) AS p75_price
        | FROM cum GROUP BY l_returnflag)
        |SELECT b.l_returnflag,
        | CAST(COUNT(*) AS BIGINT) AS n_rows,
        | CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        | MIN(p25_price) AS p25_price,
        | MIN(median_price) AS median_price,
        | MIN(p75_price) AS p75_price
        |FROM lineitem b JOIN q ON b.l_returnflag = q.l_returnflag
        |GROUP BY b.l_returnflag
        |ORDER BY b.l_returnflag""".stripMargin,
    "q34_range_join" ->
      """WITH buckets AS (
        | SELECT CAST(range AS BIGINT) AS bucket_id,
        |  1704067200000000 + CAST(range AS BIGINT) * 21600000000 AS start_us,
        |  1704067200000000 + (CAST(range AS BIGINT) + 1) * 21600000000 AS end_us
        | FROM range(0, 124))
        |SELECT bucket_id, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events JOIN buckets
        |  ON epoch_us(ts) >= start_us AND epoch_us(ts) < end_us
        |GROUP BY bucket_id ORDER BY bucket_id""".stripMargin,
    "q35_rollup" ->
      """SELECT r_name, n_name,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    // identical decimal-sum accumulation + identical final IEEE tree;
    // DuckDB decimal sums widen differently in TYPE but not in VALUE,
    // and both sides convert to double before any inexact arithmetic
    "q50_stats" ->
      """WITH m AS (
        | SELECT l_returnflag,
        |  COUNT(*) AS n,
        |  SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq,
        |  SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sp,
        |  SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS sqq,
        |  SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS spp,
        |  SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sqp
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        | CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) AS avg_qty,
        | sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS stddev_qty,
        | sqrt((CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS stddev_price,
        | (CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
        |  / (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
        |     * sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)))
        |  AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q49_grouping_sets" ->
      """SELECT r_name, o_orderstatus,
        | CAST(GROUPING(r_name, o_orderstatus) AS INT) AS gid,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name, o_orderstatus), (r_name),
        |                        (o_orderstatus), ())
        |ORDER BY gid, r_name ASC NULLS FIRST,
        |         o_orderstatus ASC NULLS FIRST""".stripMargin,
    "q36_pivot" ->
      """SELECT user_id,
        | COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        | COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        | COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        | COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // q109: the KMV sketch replayed exactly — the md5-prefix BIGINT
    // (the nibble-weighted sum, md5UniformSql without its /2^32), the
    // k smallest distinct per source via ROW_NUMBER, and the same
    // single-literal division for the estimate
    "q109_kmv_distinct" ->
      """WITH d AS (
        | SELECT source,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1)
        |         * (1::BIGINT << (4 * (8 - i))))) AS BIGINT) AS hk
        | FROM documents),
        |dist AS (SELECT DISTINCT source, hk FROM d),
        |rk AS (
        | SELECT source, hk,
        |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY hk) AS rk,
        |  COUNT(*) OVER (PARTITION BY source) AS nd
        | FROM dist),
        |kth AS (
        | SELECT source, MAX(CASE WHEN rk = 16 THEN hk END) AS hk16,
        |        MAX(nd) AS nd
        | FROM rk GROUP BY source),
        |cnt AS (SELECT source, count(*) AS n_docs FROM d GROUP BY source)
        |SELECT c.source, CAST(c.n_docs AS BIGINT) AS n_docs,
        | CAST(k.nd AS BIGINT) AS exact_distinct,
        | CASE WHEN k.nd < 16 THEN CAST(k.nd AS DOUBLE)
        |      ELSE 64424509440.0 / CAST(k.hk16 AS DOUBLE) END
        |   AS est_distinct
        |FROM cnt c JOIN kth k USING (source)
        |ORDER BY c.source""".stripMargin,
    // q112: the rollup replayed as per-source UNION ALL corpus-total,
    // both via the same ROW_NUMBER ≤ k sketch replay
    "q112_kmv_rollup" ->
      """WITH d AS (
        | SELECT source,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1)
        |         * (1::BIGINT << (4 * (8 - i))))) AS BIGINT) AS hk
        | FROM documents),
        |lv AS (
        | SELECT source AS scope, hk FROM d
        | UNION ALL
        | SELECT '(all)' AS scope, hk FROM d),
        |dist AS (SELECT DISTINCT scope, hk FROM lv),
        |rk AS (
        | SELECT scope, hk,
        |  ROW_NUMBER() OVER (PARTITION BY scope ORDER BY hk) AS rk,
        |  COUNT(*) OVER (PARTITION BY scope) AS nd
        | FROM dist),
        |kth AS (
        | SELECT scope, MAX(CASE WHEN rk = 16 THEN hk END) AS hk16,
        |        MAX(nd) AS nd
        | FROM rk GROUP BY scope),
        |cnt AS (SELECT scope, count(*) AS n_docs FROM lv GROUP BY scope)
        |SELECT c.scope, CAST(c.n_docs AS BIGINT) AS n_docs,
        | CAST(k.nd AS BIGINT) AS exact_distinct,
        | CASE WHEN k.nd < 16 THEN CAST(k.nd AS DOUBLE)
        |      ELSE 64424509440.0 / CAST(k.hk16 AS DOUBLE) END
        |   AS est_distinct
        |FROM cnt c JOIN kth k USING (scope)
        |ORDER BY c.scope""".stripMargin,
    // q116: every CMS counter is COUNT(*) of the tokens hashing to its
    // bucket and every estimate is the MIN over the depth rows — plain
    // SQL over the same four non-overlapping md5-hex slices (the q109
    // nibble-sum idiom, offset by 8r per row)
    "q116_cms_topk" ->
      """WITH t AS (
        | SELECT unnest(string_split_regex(text, '\s+')) AS token
        | FROM documents),
        |rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
        |hb AS (
        | SELECT token, r,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef', substr(md5(token), 8 * r + i, 1)) - 1)
        |         * (1::BIGINT << (4 * (8 - i))))) AS BIGINT) % 512 AS bkt
        | FROM t CROSS JOIN rs),
        |counters AS (
        | SELECT r, bkt, CAST(count(*) AS BIGINT) AS c
        | FROM hb GROUP BY r, bkt),
        |top AS (
        | SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt
        | FROM t GROUP BY token ORDER BY exact_cnt DESC, token LIMIT 10),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens_total FROM t),
        |qb AS (
        | SELECT top.token, top.exact_cnt, rs.r,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef', substr(md5(top.token), 8 * rs.r + i, 1)) - 1)
        |         * (1::BIGINT << (4 * (8 - i))))) AS BIGINT) % 512 AS bkt
        | FROM top CROSS JOIN rs)
        |SELECT qb.token, qb.exact_cnt, MIN(c.c) AS est_cnt,
        |       MAX(tot.n_tokens_total) AS n_tokens_total
        |FROM qb JOIN counters c ON c.r = qb.r AND c.bkt = qb.bkt CROSS JOIN tot
        |GROUP BY qb.token, qb.exact_cnt
        |ORDER BY qb.exact_cnt DESC, qb.token""".stripMargin,
    // q117: the incremental chain must land on exactly the
    // from-scratch sketch, so the oracle IS the from-scratch
    // definition — every nonzero counter rebuilt from the FULL corpus
    // as COUNT(*) per md5-slice bucket (q116's counters CTE, all rows)
    "q117_incr_cms" ->
      """WITH t AS (
        | SELECT unnest(string_split_regex(text, '\s+')) AS token
        | FROM documents),
        |rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
        |hb AS (
        | SELECT rs.r,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef', substr(md5(t.token), 8 * rs.r + i, 1)) - 1)
        |         * (1::BIGINT << (4 * (8 - i))))) AS BIGINT) % 512 AS bkt
        | FROM t CROSS JOIN rs)
        |SELECT CAST(r AS BIGINT) AS r, bkt, CAST(count(*) AS BIGINT) AS c
        |FROM hb GROUP BY r, bkt
        |ORDER BY r, bkt""".stripMargin,
    // q127: q117's counter replay over the SURVIVING corpus only —
    // the incremental path must land on exactly the sketch of a
    // corpus that never contained the removed docs (subtract ≡
    // rebuild-over-survivors)
    "q127_cms_subtract" ->
      s"""WITH surv AS (
        | SELECT text FROM documents
        | WHERE NOT ((${TextOps.md5UniformSql("doc_id")}) >= 0.1
        |   AND (${TextOps.md5UniformSql("doc_id")}) < 0.15)),
        |t AS (
        | SELECT unnest(string_split_regex(text, '\\s+')) AS token
        | FROM surv),
        |rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
        |hb AS (
        | SELECT rs.r,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef', substr(md5(t.token), 8 * rs.r + i, 1)) - 1)
        |         * (1::BIGINT << (4 * (8 - i))))) AS BIGINT) % 512 AS bkt
        | FROM t CROSS JOIN rs)
        |SELECT CAST(r AS BIGINT) AS r, bkt, CAST(count(*) AS BIGINT) AS c
        |FROM hb GROUP BY r, bkt
        |ORDER BY r, bkt""".stripMargin,
    // q118: the pairwise composition replayed from the same per-source
    // bottom-16 sketches (q109's ROW_NUMBER replay); the per-pair
    // union sketch is re-ranked from the two sketches' distinct union,
    // and every estimate is the same single-division arithmetic the
    // Spark side emits (see q118KmvOverlap's scaladoc)
    "q118_kmv_overlap" ->
      """WITH d AS (
        | SELECT source,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1)
        |         * (1::BIGINT << (4 * (8 - i))))) AS BIGINT) AS hk
        | FROM documents),
        |dist AS (SELECT DISTINCT source, hk FROM d),
        |rk AS (
        | SELECT source, hk,
        |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY hk) AS rk
        | FROM dist),
        |sk AS (SELECT source, hk FROM rk WHERE rk <= 16),
        |pr AS (
        | SELECT a.source AS sa, b.source AS sb
        | FROM (SELECT DISTINCT source FROM d) a
        | JOIN (SELECT DISTINCT source FROM d) b ON a.source < b.source),
        |uni AS (
        | SELECT pr.sa, pr.sb, s.hk FROM pr JOIN sk s ON s.source = pr.sa
        | UNION
        | SELECT pr.sa, pr.sb, s.hk FROM pr JOIN sk s ON s.source = pr.sb),
        |urk AS (
        | SELECT sa, sb, hk,
        |  ROW_NUMBER() OVER (PARTITION BY sa, sb ORDER BY hk) AS rk
        | FROM uni),
        |u AS (SELECT sa, sb, hk, rk FROM urk WHERE rk <= 16),
        |agg AS (
        | SELECT u.sa, u.sb,
        |  COUNT(*) AS union_k,
        |  MAX(CASE WHEN u.rk = 16 THEN u.hk END) AS hk16,
        |  SUM(CASE WHEN x.hk IS NOT NULL AND y.hk IS NOT NULL
        |      THEN 1 ELSE 0 END) AS common_k
        | FROM u
        | LEFT JOIN sk x ON x.source = u.sa AND x.hk = u.hk
        | LEFT JOIN sk y ON y.source = u.sb AND y.hk = u.hk
        | GROUP BY u.sa, u.sb)
        |SELECT sa AS src_a, sb AS src_b,
        | CAST(common_k AS BIGINT) AS common_k,
        | CAST(union_k AS BIGINT) AS union_k,
        | CASE WHEN union_k < 16 THEN CAST(union_k AS DOUBLE)
        |      ELSE 64424509440.0 / CAST(hk16 AS DOUBLE) END AS union_est,
        | CAST(common_k AS DOUBLE) / CAST(union_k AS DOUBLE) AS jaccard_est,
        | CASE WHEN union_k < 16 THEN CAST(common_k AS DOUBLE)
        |      ELSE CAST(common_k * 64424509440 AS DOUBLE)
        |           / CAST(16 * hk16 AS DOUBLE) END AS inter_est
        |FROM agg ORDER BY src_a, src_b""".stripMargin,
    // q120: the incremental chain must land on exactly the
    // from-scratch sketches, so the oracle IS q109's replay over the
    // full corpus (minus its exact-count evidence column)
    "q120_incr_kmv" ->
      """WITH d AS (
        | SELECT source,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1)
        |         * (1::BIGINT << (4 * (8 - i))))) AS BIGINT) AS hk
        | FROM documents),
        |dist AS (SELECT DISTINCT source, hk FROM d),
        |rk AS (
        | SELECT source, hk,
        |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY hk) AS rk,
        |  COUNT(*) OVER (PARTITION BY source) AS nd
        | FROM dist),
        |kth AS (
        | SELECT source, MAX(CASE WHEN rk = 16 THEN hk END) AS hk16,
        |        MAX(nd) AS nd
        | FROM rk GROUP BY source),
        |cnt AS (SELECT source, count(*) AS n_docs FROM d GROUP BY source)
        |SELECT c.source, CAST(c.n_docs AS BIGINT) AS n_docs,
        | CASE WHEN k.nd < 16 THEN CAST(k.nd AS DOUBLE)
        |      ELSE 64424509440.0 / CAST(k.hk16 AS DOUBLE) END
        |   AS est_distinct
        |FROM cnt c JOIN kth k USING (source)
        |ORDER BY c.source""".stripMargin,
    // q125: both versions' counter tables rebuilt from scratch (q116's
    // bucket replay; v1's restricted to the standing md5-uniform
    // split), each estimate the MIN over depth rows, delta exact
    "q125_version_drift" ->
      s"""WITH t2 AS (
        | SELECT unnest(string_split_regex(text, '\\s+')) AS token
        | FROM documents),
        |t1 AS (
        | SELECT unnest(string_split_regex(text, '\\s+')) AS token
        | FROM documents
        | WHERE (${graft.queries.TextOps.md5UniformSql("doc_id")}) >= 0.1),
        |rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
        |c2 AS (
        | SELECT rs.r,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef', substr(md5(t2.token), 8 * rs.r + i, 1)) - 1)
        |         * (1::BIGINT << (4 * (8 - i))))) AS BIGINT) % 512 AS bkt,
        |  COUNT(*) AS c
        | FROM t2 CROSS JOIN rs GROUP BY 1, 2),
        |c1 AS (
        | SELECT rs.r,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef', substr(md5(t1.token), 8 * rs.r + i, 1)) - 1)
        |         * (1::BIGINT << (4 * (8 - i))))) AS BIGINT) % 512 AS bkt,
        |  COUNT(*) AS c
        | FROM t1 CROSS JOIN rs GROUP BY 1, 2),
        |top AS (
        | SELECT token, COUNT(*) AS exact_cnt FROM t2 GROUP BY token
        | ORDER BY exact_cnt DESC, token LIMIT 10),
        |qb AS (
        | SELECT top.token, top.exact_cnt, rs.r,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef', substr(md5(top.token), 8 * rs.r + i, 1)) - 1)
        |         * (1::BIGINT << (4 * (8 - i))))) AS BIGINT) % 512 AS bkt
        | FROM top CROSS JOIN rs),
        |e AS (
        | SELECT qb.token, qb.exact_cnt,
        |  MIN(COALESCE(c1.c, 0)) AS est_v1,
        |  MIN(COALESCE(c2.c, 0)) AS est_v2
        | FROM qb
        | LEFT JOIN c1 ON c1.r = qb.r AND c1.bkt = qb.bkt
        | LEFT JOIN c2 ON c2.r = qb.r AND c2.bkt = qb.bkt
        | GROUP BY qb.token, qb.exact_cnt)
        |SELECT token, CAST(exact_cnt AS BIGINT) AS exact_cnt,
        | CAST(est_v1 AS BIGINT) AS est_v1,
        | CAST(est_v2 AS BIGINT) AS est_v2,
        | CAST(est_v2 - est_v1 AS BIGINT) AS est_delta
        |FROM e ORDER BY exact_cnt DESC, token""".stripMargin)
}
