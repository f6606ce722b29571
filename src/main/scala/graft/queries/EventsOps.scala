package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Event-log operators over `events`: semi-structured extraction,
  * as-of joins, and the reference's group-first fill (SURVEY A1 — its
  * known-hard #1) oracle-checked on driver data.
  *
  * Timestamps: `graft.Tables.events` normalizes `ts` to a µs
  * TimestampType regardless of the parquet generation (nanos-long or
  * timestamp[us] — the testdata has shipped as both); both engines
  * reduce to µs epoch longs (Spark `unix_micros` == DuckDB `epoch_us`,
  * exact at µs) so every time-valued output is an exact BIGINT.
  */
object EventsOps {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")

  // --------------------------------------------------------------- q26
  /** Semi-structured extraction: JSON field → typed column → grouped
    * aggregate. `get_json_object` is codegen'd; at scale prefer
    * `from_json` with an explicit schema once per pipeline. */
  def q26JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast(IntegerType)
    events(spark, dir)
      .select(col("event_type"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k").cast(LongType)).as("sum_k"),
        count(when(col("k").isNull, 1)).as("null_k"))
      .orderBy(col("event_type"))
  }

  // --------------------------------------------------------------- q27
  /** As-of join, windowed form: for each purchase, the most recent
    * PRIOR click of the same user. Equivalent to `ASOF JOIN` but
    * shuffle-once: one partition-by-user pass, no range join — the
    * composition Spark-first design prefers when the "right side" is
    * the same stream (SURVEY §2.6 extension). */
  def q27AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("last_click_us",
        max(when(col("event_type") === "click", unix_micros(col("ts")))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("last_click_us"))
      .orderBy(col("event_id"))
  }

  // --------------------------------------------------------------- q28
  /** The C1/C4/C5 coercion family on driver data: a dirtied string
    * column round-trips through try_cast + magnitude guard; nulls
    * count as quarantine would. Decimal-exact sum of survivors. */
  def q28CoerceClean(spark: SparkSession, dir: String): DataFrame = {
    val raw = when(col("event_id") % 7 === 0, lit("not-a-number"))
      .otherwise(col("value").cast(StringType))
    val parsed = raw.try_cast(DoubleType)
    val capped = when(parsed.isNotNull && abs(parsed) > 150.0, lit(null))
      .otherwise(parsed)
    events(spark, dir)
      .select(col("event_type"), capped.as("v"))
      .groupBy(col("event_type"))
      .agg(
        count(when(col("v").isNull, 1)).as("n_quarantined"),
        count(col("v")).as("n_clean"),
        sum(col("v").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_clean"))
      .orderBy(col("event_type"))
  }

  // --------------------------------------------------------------- q29
  /** SURVEY A1 — grouped first-non-null broadcast back to rows, with a
    * pinned total order (ts, event_id), oracle-checked: the exact
    * pandas `groupby().transform("first")` semantics the ETL uses,
    * demonstrated deterministically on driver data. Nulls are
    * synthesized (event_id % 5) since events.props has none. */
  def q29GroupFirstFill(spark: SparkSession, dir: String): DataFrame = {
    val dirty = when(col("event_id") % 5 === 0, lit(null))
      .otherwise(col("props"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events(spark, dir)
      .withColumn("props_dirty", dirty)
      .withColumn("props_filled",
        coalesce(
          col("props_dirty"),
          first(col("props_dirty"), ignoreNulls = true).over(w),
          lit("unknown")))
      .select(col("event_id"), col("user_id"), col("props_filled"))
      .orderBy(col("event_id"))
  }

  // --------------------------------------------------------------- q32
  /** Gap-based sessionization via `session_window` (30 min inactivity
    * gap) — the SAME definition runs incrementally under Structured
    * Streaming with a watermark (see StreamingDaily/StreamingSpec).
    * Oracle: the equivalent gaps-and-islands SQL. Session bounds as
    * epoch-µs longs; Spark's session end = last event + gap. */
  def q32Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val gap = "30 minutes"
    events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("session_end_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start_us"))
  }

  // --------------------------------------------------------------- q58
  /** Funnel analysis — ordered-step matching per user: how many users
    * performed view → click → purchase IN THAT ORDER (greedy
    * earliest-match: t1 = first view, t2 = first click after t1,
    * t3 = first purchase after t2). The product-analytics staple the
    * plain groupBy family can't express — each step's predicate
    * depends on the previous step's match time.
    *
    * Scale shape: three chained UNORDERED conditional-min windows
    * over the same user partition. All three share ONE shuffle on
    * user_id and ONE partition-grouping sort (WindowExec groups rows
    * by sorting on the partition key; with no frame orderBy there is
    * no further ordering work) — the plan stacks Window/Window/Window
    * directly on a single Sort+Exchange, pinned in PlanSpec. Then a
    * 1-row global conditional count-distinct. A self-join formulation
    * (events×events×events) would be cubic in per-user event count;
    * this is linear. */
  def q58Funnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts_us"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts_us") > col("t1"),
          col("ts_us"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts_us") > col("t2"),
          col("ts_us"))).over(w))
      .agg(
        countDistinct(when(col("t1").isNotNull, col("user_id")))
          .as("n_view"),
        countDistinct(when(col("t2").isNotNull, col("user_id")))
          .as("n_view_click"),
        countDistinct(when(col("t3").isNotNull, col("user_id")))
          .as("n_full_funnel"))
  }

  // --------------------------------------------------------------- q59
  /** Cohort retention — the other product-analytics staple beside
    * [[q58Funnel]]: users grouped by their FIRST-activity week
    * (cohort), counted again in every later week they return —
    * the (cohort_week, week_offset) retention triangle.
    *
    * Scale shape: activity collapses to distinct (user, week) FIRST
    * (the big shuffle, partial-agg combined), cohort assignment is a
    * groupBy over that already-small frame, and the final count joins
    * the two small frames. All integer µs arithmetic (`div` — both
    * engines truncate identically for the non-negative offsets this
    * data guarantees); no timestamps or doubles cross the oracle. */
  def q59Cohort(spark: SparkSession, dir: String): DataFrame = {
    val weekUs = 7L * 24 * 3600 * 1000000L
    val originUs = 1704067200000000L // 2024-01-01, q34's anchor
    val act = events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .selectExpr("user_id",
        s"(ts_us - ${originUs}L) div ${weekUs}L AS week")
      .distinct()
    val cohort = act.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    act.join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  // --------------------------------------------------------------- q62
  /** Per-type z-score outlier detection — the monitoring/data-quality
    * operator over an event stream's value distribution: an event is
    * an outlier when its value sits more than `k` sample standard
    * deviations from its event type's mean.
    *
    * Cross-engine exactness reuses q50's recipe: the per-type moments
    * accumulate as exact DECIMAL sums (order-independent under any
    * partitioning — built-in `stddev` aggregates doubles in combine
    * order and drifts in the last ulp), then mean/stddev/zscore derive
    * in one fixed IEEE expression both engines evaluate identically.
    *
    * Scale shape: one partial+final aggregate pass over the events for
    * the moments (|event types| rows out), broadcast back onto the
    * stream — the event table itself never shuffles to be scored; the
    * only full-width movement is the presentation sort. */
  def q62Outliers(spark: SparkSession, dir: String, k: Double = 2.0)
      : DataFrame = {
    val v = col("value").cast(DecimalType(12, 2))
    val m = events(spark, dir).groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(v).as("sv"),
      sum(v * v).as("svv"))
    val nD = col("n").cast(DoubleType)
    def d(c: String) = col(c).cast(DoubleType)
    val stats = m.select(
      col("event_type"),
      (d("sv") / nD).as("mean_value"),
      sqrt((nD * d("svv") - d("sv") * d("sv")) / (nD * (nD - lit(1.0))))
        .as("stddev_value"))
    events(spark, dir).join(broadcast(stats), "event_type")
      .filter(abs(col("value") - col("mean_value")) >
        lit(k) * col("stddev_value"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("mean_value"), col("stddev_value"),
        ((col("value") - col("mean_value")) / col("stddev_value"))
          .as("zscore"))
      .orderBy(col("event_id"))
  }

  // --------------------------------------------------------------- q88
  /** Event-type co-occurrence (market-basket over users): for every
    * unordered type pair, how many users did BOTH, alongside each
    * type's own user count and the total user universe — the exact
    * integer sufficient statistics from which support, confidence,
    * lift and PMI all derive downstream (division stays out of the
    * engine, so the result is hash-exact everywhere).
    *
    * Scale shape: the DISTINCT (user, type) projection is the only
    * corpus-sized shuffle; the pair self-join is per-user and bounded
    * by the type vocabulary k (≤ k²/2 pairs per user — never
    * events²), and the pair counts partial-aggregate map-side down to
    * ≤ k² rows. Type totals and the universe count are
    * broadcast-sized joins onto that. */
  def q88Cooccurrence(spark: SparkSession, dir: String): DataFrame = {
    val ut = events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
      .localCheckpoint() // 4 consumers: pair sides, per-type, total
    val pairs = ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_users_both"))
    val per = ut.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))
    val total = ut.agg(countDistinct(col("user_id")).as("n_users_total"))
    pairs
      .join(per.select(col("event_type").as("type_a"),
        col("n_users").as("n_users_a")), "type_a")
      .join(per.select(col("event_type").as("type_b"),
        col("n_users").as("n_users_b")), "type_b")
      .crossJoin(broadcast(total))
      .select("type_a", "type_b", "n_users_both",
        "n_users_a", "n_users_b", "n_users_total")
      .orderBy("type_a", "type_b")
  }

  // --------------------------------------------------------------- q92
  /** Event-rate spike detection over a TRAILING window: per
    * (event_type, hour) count n, compare to the previous 3 observed
    * hours — spike iff `3·n > 2·Σprev` (rate > 2× the trailing mean,
    * cross-multiplied so no division runs) and only once full history
    * exists. The frame is `ROWS 3 PRECEDING .. 1 PRECEDING` — the
    * bounded trailing shape (distinct from q6's running total), with
    * row-based semantics over OBSERVED hours so both engines agree
    * even across gaps.
    *
    * Scale shape: the corpus-sized work is one partial+final count to
    * ≤ |types|·|hours| rows; the window then runs per type over that
    * tiny series. Monitoring at 100 TB/day is exactly this rollup —
    * the fact stream never reaches the window. */
  def q92RateSpike(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(-3, -1)
    // Spark `div` truncates toward zero, DuckDB `//` floors — they
    // diverge on pre-1970 timestamps, so fail loudly on negative
    // epochs (q71 discipline) instead of silently mis-bucketing.
    val bucket = when(expr("unix_micros(ts)") >= 0L,
      expr("unix_micros(ts) div 3600000000"))
      .otherwise(raise_error(lit(
        "q92: pre-1970 timestamp — Spark div (truncate) and DuckDB // (floor) diverge")))
    events(spark, dir)
      .select(col("event_type"), bucket.as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("n"))
      .withColumn("trailing_n", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("n_prev_windows", count(col("n")).over(w))
      .withColumn("is_spike",
        (col("n_prev_windows") === 3 &&
          col("n") * 3 > col("trailing_n") * 2).cast("long"))
      .orderBy("event_type", "bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q92_rate_spike"       -> (q92RateSpike _),
    "q62_outliers"         -> ((s: SparkSession, d: String) => q62Outliers(s, d)),
    "q26_json_extract"     -> (q26JsonExtract _),
    "q27_asof_join"        -> (q27AsofJoin _),
    "q28_coerce_clean"     -> (q28CoerceClean _),
    "q29_group_first_fill" -> (q29GroupFirstFill _),
    "q32_sessionize"       -> (q32Sessionize _),
    "q58_funnel"           -> (q58Funnel _),
    "q59_cohort"           -> (q59Cohort _),
    "q88_cooccurrence"     -> (q88Cooccurrence _))

  val oracle: Map[String, String] = Map(
    // q92: epoch_us // == unix_micros div on non-negative epochs;
    // identical row-based trailing frame in both engines
    "q92_rate_spike" ->
      """WITH pb AS (
        | SELECT event_type, epoch_us(ts) // 3600000000 AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n
        | FROM events GROUP BY 1, 2)
        |SELECT event_type, bucket, n,
        | CAST(COALESCE(SUM(n) OVER w, 0) AS BIGINT) AS trailing_n,
        | CAST(COUNT(n) OVER w AS BIGINT) AS n_prev_windows,
        | CAST(CASE WHEN COUNT(n) OVER w = 3
        |            AND n * 3 > COALESCE(SUM(n) OVER w, 0) * 2
        |      THEN 1 ELSE 0 END AS BIGINT) AS is_spike
        |FROM pb
        |WINDOW w AS (PARTITION BY event_type ORDER BY bucket
        |             ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
        |ORDER BY event_type, bucket""".stripMargin,
    // q88: pure integer counts; same distinct projection + per-user
    // self-join on both engines
    "q88_cooccurrence" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |per AS (
        | SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
        | FROM ut GROUP BY event_type),
        |tot AS (
        | SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_total
        | FROM ut),
        |pairs AS (
        | SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_users_both
        | FROM ut a JOIN ut b
        |   ON a.user_id = b.user_id AND a.event_type < b.event_type
        | GROUP BY 1, 2)
        |SELECT type_a, type_b, n_users_both, pa.n_users AS n_users_a,
        | pb.n_users AS n_users_b, n_users_total
        |FROM pairs
        |JOIN per pa ON pa.event_type = type_a
        |JOIN per pb ON pb.event_type = type_b
        |CROSS JOIN tot
        |ORDER BY type_a, type_b""".stripMargin,
    // q62: q50's exactness recipe — decimal moment sums, then one
    // fixed IEEE expression for mean/stddev/zscore in both engines
    "q62_outliers" ->
      """WITH m AS (
        | SELECT event_type, COUNT(*) AS n,
        |  SUM(CAST(value AS DECIMAL(12,2))) AS sv,
        |  SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS svv
        | FROM events GROUP BY event_type),
        |s AS (
        | SELECT event_type,
        |  CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS mean_value,
        |  sqrt((CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
        |        - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
        |       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
        |    AS stddev_value
        | FROM m)
        |SELECT event_id, e.event_type, value, mean_value, stddev_value,
        | (value - mean_value) / stddev_value AS zscore
        |FROM events e JOIN s ON e.event_type = s.event_type
        |WHERE abs(value - mean_value) > 2.0 * stddev_value
        |ORDER BY event_id""".stripMargin,
    // q59: integer µs arithmetic only; `//` floors = Spark `div`
    // truncation because offsets are guaranteed non-negative here
    "q59_cohort" ->
      """WITH e AS (
        | SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |act AS (
        | SELECT DISTINCT user_id,
        |  CAST((ts_us - 1704067200000000) // 604800000000 AS BIGINT) AS week
        | FROM e),
        |c AS (SELECT user_id, MIN(week) AS cohort_week
        |      FROM act GROUP BY user_id)
        |SELECT c.cohort_week, act.week - c.cohort_week AS week_offset,
        | CAST(COUNT(DISTINCT act.user_id) AS BIGINT) AS n_users
        |FROM act JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q58: identical chained-window shape (DuckDB needs the CTE chain
    // because a window can't reference a sibling window's output);
    // epoch_us truncation matches the Spark side's µs timestamps
    "q58_funnel" ->
      """WITH e AS (
        | SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |a AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts_us END)
        |        OVER (PARTITION BY user_id) AS t1 FROM e),
        |b AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts_us > t1
        |                         THEN ts_us END)
        |        OVER (PARTITION BY user_id) AS t2 FROM a),
        |c AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts_us > t2
        |                         THEN ts_us END)
        |        OVER (PARTITION BY user_id) AS t3 FROM b)
        |SELECT
        | CAST(COUNT(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS BIGINT) AS n_view,
        | CAST(COUNT(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS BIGINT) AS n_view_click,
        | CAST(COUNT(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS BIGINT) AS n_full_funnel
        |FROM c""".stripMargin,
    "q26_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(CAST(json_extract_string(props,'$.k') AS INTEGER) AS BIGINT)) AS BIGINT) AS sum_k,
        | COUNT(CASE WHEN json_extract_string(props,'$.k') IS NULL THEN 1 END) AS null_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q27_asof_join" ->
      """SELECT event_id, user_id, ts_us, last_click_us FROM (
        | SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
        |  max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_us
        | FROM events) t
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q28_coerce_clean" ->
      """WITH t AS (
        | SELECT event_type,
        |  CASE WHEN TRY_CAST(CASE WHEN event_id % 7 = 0 THEN 'not-a-number'
        |            ELSE CAST(value AS VARCHAR) END AS DOUBLE) IS NOT NULL
        |        AND abs(TRY_CAST(CASE WHEN event_id % 7 = 0 THEN 'not-a-number'
        |            ELSE CAST(value AS VARCHAR) END AS DOUBLE)) > 150.0
        |       THEN NULL
        |       ELSE TRY_CAST(CASE WHEN event_id % 7 = 0 THEN 'not-a-number'
        |            ELSE CAST(value AS VARCHAR) END AS DOUBLE) END AS v
        | FROM events)
        |SELECT event_type,
        | COUNT(CASE WHEN v IS NULL THEN 1 END) AS n_quarantined,
        | COUNT(v) AS n_clean,
        | CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sum_clean
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q32_sessionize" ->
      """WITH e AS (
        | SELECT user_id, epoch_us(ts) AS ts_us,
        |  CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |         OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |       >= 1800000000 THEN 1 ELSE 0 END AS new_session
        | FROM events),
        |s AS (
        | SELECT user_id, ts_us,
        |  SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        | FROM e)
        |SELECT user_id, MIN(ts_us) AS session_start_us,
        | MAX(ts_us) + 1800000000 AS session_end_us,
        | COUNT(*) AS n_events
        |FROM s GROUP BY user_id, session_no
        |ORDER BY user_id, session_start_us""".stripMargin,
    "q29_group_first_fill" ->
      """SELECT event_id, user_id,
        | coalesce(
        |   CASE WHEN event_id % 5 = 0 THEN NULL ELSE props END,
        |   first_value(CASE WHEN event_id % 5 = 0 THEN NULL ELSE props END IGNORE NULLS)
        |     OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
        |   'unknown') AS props_filled
        |FROM events ORDER BY event_id""".stripMargin)
}
