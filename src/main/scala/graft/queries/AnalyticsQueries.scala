package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The analytic SQL surface the reference delegates to ClickHouse
  * (SURVEY.md §2.5-§2.6): time-range scans, group-bys, array explode,
  * joins, windows, rollup, set ops — all built-in Catalyst operators; our
  * work is declaring plans that push filters/pruning to the parquet scan
  * and keep everything in whole-stage codegen.
  *
  * Float determinism note: SUMs over doubles are computed in exact
  * fixed-point integer space — `floor(x*scale + 0.5)` is bit-identical in
  * every engine (IEEE multiply + floor have no rounding-mode ambiguity,
  * unlike double→DECIMAL casts, which Spark does via the shortest decimal
  * string and DuckDB via binary rounding). Integer sums are
  * order-independent, so the result is stable under any partitioning and
  * hash-matches the DuckDB oracle. */
object AnalyticsQueries {

  /** floor(c*scale + 0.5) as long — exact fixed-point of a double. */
  private def fx(c: Column, scale: Long): Column =
    floor(c * lit(scale.toDouble) + lit(0.5)).cast("long")

  /** Σ price·(1−discount) via cents × (100−d100), rescaled to a double. */
  private def revenueSum(price: Column, discount: Column): Column =
    (sum(fx(price, 100) * (lit(100L) - fx(discount, 100))).cast("double") / lit(1.0e4))

  // ---- events-table surface (§2.5) ----------------------------------------

  def eventsTimeRange(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "events")
      .filter($"ts" >= lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")) &&
              $"ts" <  lit(java.sql.Timestamp.valueOf("2024-01-20 00:00:00")))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        (sum(fx($"value", 1000000L)).cast("double") / lit(1.0e6)).as("sum_value"),
        unix_micros(min($"ts")).as("first_us"), unix_micros(max($"ts")).as("last_us"))
      .orderBy($"event_type")
  }

  val eventsTimeRangeOracle: String = """
SELECT event_type, count(*) AS n,
       CAST(SUM(CAST(floor(value*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_value,
       epoch_us(min(ts)) AS first_us, epoch_us(max(ts)) AS last_us
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
GROUP BY event_type ORDER BY event_type"""

  /** Schema'd single-parse `from_json` (a Jackson parse per row against
    * one needed field) rather than `get_json_object` path evaluation —
    * same result, roughly half the per-row cost on the wide props blob. */
  def eventsJsonProps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.operators.Par.widen(Tables(spark, sfDir, "events"))
      .select($"user_id",
        (from_json($"props", "k LONG", Map.empty[String, String])("k") % 10).as("k_bucket"))
      .groupBy($"k_bucket")
      .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("users"))
      .orderBy($"k_bucket")
  }

  val eventsJsonPropsOracle: String = """
SELECT CAST(props->>'$.k' AS BIGINT) % 10 AS k_bucket,
       count(*) AS n, count(DISTINCT user_id) AS users
FROM events GROUP BY 1 ORDER BY 1"""

  /** Gap-based sessionization of the events stream table (30-min gap) —
    * the generic analogue of the reference's session concept, pure window
    * functions, shuffle only on user_id. */
  def eventsSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "events").createOrReplaceTempView("ev_sess_in")
    spark.sql("""
WITH t AS (
  SELECT user_id, unix_micros(ts) AS us,
         CASE WHEN unix_micros(ts) - lag(unix_micros(ts))
                   OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
              OR lag(unix_micros(ts)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM ev_sess_in),
s AS (
  SELECT user_id, us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM t)
SELECT user_id, min(us) AS session_start_us, max(us) AS session_end_us,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
ORDER BY user_id, session_start_us""")
  }

  val eventsSessionizeOracle: String = """
WITH t AS (
  SELECT user_id, epoch_us(ts) AS us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
              OR lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events),
s AS (
  SELECT user_id, us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM t)
SELECT user_id, min(us) AS session_start_us, max(us) AS session_end_us,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
ORDER BY user_id, session_start_us"""

  /** ClickHouse `windowFunnel` analogue: per user, the deepest strict
    * view → click → purchase prefix where every later step lands within
    * one hour of the FIRST view (step timestamps are the earliest
    * qualifying event of each stage). Composed as two-pass conditional
    * minima — no per-user event array, no window sort: three
    * aggregations and three joins ALL keyed on user_id, so at scale one
    * hash partitioning serves every stage and compute is proportional
    * to matched-step events. All time arithmetic in long micros. */
  def eventsFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events")
      .select($"user_id", $"event_type", unix_micros($"ts").as("t_us"))
    graft.operators.Funnel.funnel(ev, "user_id", "event_type", "t_us",
        steps = Seq("view", "click", "purchase"), windowUs = 3600000000L)
      .orderBy("user_id")
  }

  val eventsFunnelOracle: String = """
WITH s1 AS (
  SELECT user_id, min(epoch_us(ts)) AS t1_us FROM events
  WHERE event_type = 'view' GROUP BY 1),
s2 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t2_us
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click'
    AND epoch_us(e.ts) > s1.t1_us AND epoch_us(e.ts) <= s1.t1_us + 3600000000
  GROUP BY 1),
s3 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t3_us
  FROM events e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase'
    AND epoch_us(e.ts) > s2.t2_us AND epoch_us(e.ts) <= s1.t1_us + 3600000000
  GROUP BY 1)
SELECT s1.user_id,
       CAST(CASE WHEN t3_us IS NOT NULL THEN 3
                 WHEN t2_us IS NOT NULL THEN 2 ELSE 1 END AS INTEGER) AS funnel_level,
       t1_us, t2_us, t3_us
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
ORDER BY s1.user_id"""

  /** ClickHouse `retention` analogue: cohort users by first-active day,
    * count who returned on day+1 and day+7. Same same-key discipline as
    * [[eventsFunnel]] — cohort min, flag agg, and the join are all
    * keyed on user_id (one partitioning; duplicates need no distinct,
    * max/min absorb them), only the final cohort roll-up re-keys, onto
    * ~365 rows/year. Days are integer `micros div 86_400_000_000` —
    * no date types, no timezone semantics to disagree on. */
  def eventsRetention(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // TRUE integer division (div), not divide+cast: double division
    // rounds half-ulp cases up and floors negatives toward zero — both
    // diverge from the oracle's integer `//`
    val d = Tables(spark, sfDir, "events")
      .select($"user_id", expr("unix_micros(ts) div 86400000000").as("day"))
    graft.operators.Retention.cohorts(d, "user_id", "day", offsets = Seq(1, 7))
      .select($"cohort_period".as("cohort_day"), $"n_keys".as("n_users"),
        $"retained_p1".as("retained_d1"), $"retained_p7".as("retained_d7"))
      .orderBy("cohort_day")
  }

  val eventsRetentionOracle: String = """
WITH d AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
c AS (SELECT user_id, min(day) AS day0 FROM d GROUP BY 1),
f AS (
  SELECT d.user_id, min(c.day0) AS day0,
         max(CASE WHEN d.day = c.day0 + 1 THEN 1 ELSE 0 END) AS d1,
         max(CASE WHEN d.day = c.day0 + 7 THEN 1 ELSE 0 END) AS d7
  FROM d JOIN c USING (user_id) GROUP BY 1)
SELECT day0 AS cohort_day, CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(d1) AS BIGINT) AS retained_d1,
       CAST(sum(d7) AS BIGINT) AS retained_d7
FROM f GROUP BY 1 ORDER BY 1"""

  /** ClickHouse `sequenceMatch('(?1).*(?2).*(?3)')` analogue: does each
    * user have view < click < purchase timestamps in strict order, no
    * window bound? Composed from [[graft.operators.Funnel]] with an
    * effectively-unbounded window (100 years — NOT Long.MaxValue, which
    * would overflow `t1 + window`): the funnel's greedy earliest-step
    * cascade is exactly the optimal subsequence-existence check. */
  def eventsSequenceMatch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events")
      .select($"user_id", $"event_type", expr("unix_micros(ts)").as("ts_us"))
    graft.operators.Funnel.funnel(ev, "user_id", "event_type", "ts_us",
        steps = Seq("view", "click", "purchase"),
        windowUs = 100L * 365 * 24 * 3600 * 1000000)
      .select($"user_id",
        ($"funnel_level" === 3).cast("int").as("matched"))
      .orderBy("user_id")
  }

  val eventsSequenceMatchOracle: String = """
WITH s1 AS (
  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1),
s2 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1 GROUP BY 1),
s3 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2 GROUP BY 1)
SELECT s1.user_id, CAST(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS matched
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
ORDER BY s1.user_id"""

  /** ClickHouse `sequenceMatch('(?1)(?t<=86400)(?2)(?t<=259200)(?3)')`
    * analogue: view → click within a day → purchase within three days,
    * all inside a 30-day window — per-step gap caps on top of the
    * window, greedy-earliest at each stage ([[graft.operators.Funnel]]
    * semantics; the oracle mirrors the cascade stage by stage). */
  def eventsSequenceMatchTimed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events")
      .select($"user_id", $"event_type", expr("unix_micros(ts)").as("ts_us"))
    graft.operators.Funnel.funnel(ev, "user_id", "event_type", "ts_us",
        steps = Seq("view", "click", "purchase"),
        windowUs = 30L * 24 * 3600 * 1000000,
        maxGapsUs = Seq(Some(86400L * 1000000), Some(259200L * 1000000)))
      .select($"user_id", $"funnel_level",
        ($"funnel_level" === 3).cast("int").as("matched"))
      .orderBy("user_id")
  }

  val eventsSequenceMatchTimedOracle: String = """
WITH s1 AS (
  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1),
s2 AS (
  SELECT e.user_id, min(s1.t1) AS t1, min(epoch_us(e.ts)) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click'
    AND epoch_us(e.ts) > s1.t1
    AND epoch_us(e.ts) <= s1.t1 + 86400000000
    AND epoch_us(e.ts) <= s1.t1 + 2592000000000
  GROUP BY 1),
s3 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase'
    AND epoch_us(e.ts) > s2.t2
    AND epoch_us(e.ts) <= s2.t2 + 259200000000
    AND epoch_us(e.ts) <= s2.t1 + 2592000000000
  GROUP BY 1)
SELECT s1.user_id,
       CAST(1 + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS funnel_level,
       CAST(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS matched
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
ORDER BY s1.user_id"""

  /** ClickHouse `sequenceCount('(?1)(?2)')` analogue: how many DISJOINT
    * view→click chains each user completed
    * ([[graft.operators.SequenceCount]] counter-promotion greedy). The
    * oracle states the two-step closed form: with same-timestamp clicks
    * ordered before views (the strict-increase rule), matched = #click −
    * max_prefix(#click − #view) — parenthesis matching. k ≥ 3 is pinned
    * by the spec's exhaustive-optimum differential instead. */
  def eventsSequenceCount(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events")
      .select($"user_id", $"event_type", expr("unix_micros(ts)").as("ts_us"))
    graft.operators.SequenceCount.sequenceCount(ev, "user_id", "event_type",
        "ts_us", steps = Seq("view", "click"))
      .orderBy("user_id")
  }

  val eventsSequenceCountOracle: String = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t,
         CASE event_type WHEN 'view' THEN 1 ELSE -1 END AS delta,
         CASE event_type WHEN 'view' THEN 1 ELSE 0 END AS is_a
  FROM events WHERE event_type IN ('view', 'click')),
r AS (
  SELECT user_id, is_a,
         sum(-delta) OVER (PARTITION BY user_id ORDER BY t, delta
                           ROWS UNBOUNDED PRECEDING) AS b_minus_a
  FROM ev),
agg AS (
  SELECT user_id,
         sum(CASE WHEN is_a = 0 THEN 1 ELSE 0 END) AS n_b,
         greatest(max(b_minus_a), 0) AS unmatched_b,
         sum(is_a) AS n_a
  FROM r GROUP BY 1)
SELECT user_id, CAST(n_b - unmatched_b AS BIGINT) AS n_matches
FROM agg WHERE n_a > 0 ORDER BY user_id"""

  /** Cumulative sibling of [[eventsRetention]]: "returned within ≤ N
    * days" (any day in (day0, day0+N]) instead of exactly day0+N —
    * monotone across offsets, the shape retention dashboards plot.
    * Same one-partitioning key discipline. */
  def eventsRetentionCum(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = Tables(spark, sfDir, "events")
      .select($"user_id", expr("unix_micros(ts) div 86400000000").as("day"))
    graft.operators.Retention.cohorts(d, "user_id", "day",
        offsets = Seq(1, 7), cumulative = true)
      .select($"cohort_period".as("cohort_day"), $"n_keys".as("n_users"),
        $"retained_p1".as("retained_w1"), $"retained_p7".as("retained_w7"))
      .orderBy("cohort_day")
  }

  val eventsRetentionCumOracle: String = """
WITH d AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
c AS (SELECT user_id, min(day) AS day0 FROM d GROUP BY 1),
f AS (
  SELECT d.user_id, min(c.day0) AS day0,
         max(CASE WHEN d.day > c.day0 AND d.day <= c.day0 + 1 THEN 1 ELSE 0 END) AS w1,
         max(CASE WHEN d.day > c.day0 AND d.day <= c.day0 + 7 THEN 1 ELSE 0 END) AS w7
  FROM d JOIN c USING (user_id) GROUP BY 1)
SELECT day0 AS cohort_day, CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(w1) AS BIGINT) AS retained_w1,
       CAST(sum(w7) AS BIGINT) AS retained_w7
FROM f GROUP BY 1 ORDER BY 1"""

  /** Spark's built-in gap-based session_window over the events stream
    * table (the declarative sibling of the manual window-function
    * sessionization above). */
  def eventsSessionWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "events")
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"), unix_micros(min($"ts")).as("session_start_us"))
      .select($"user_id", $"session_start_us", $"n_events")
      .orderBy($"user_id", $"session_start_us")
  }

  // NB >= not >: Spark's session_window end is exclusive — an event at
  // exactly prev_ts + gap starts a NEW session.
  val eventsSessionWindowOracle: String = """
WITH t AS (
  SELECT user_id, epoch_us(ts) AS us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts) >= 1800000000
              OR lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events),
s AS (
  SELECT user_id, us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM t)
SELECT user_id, min(us) AS session_start_us, count(*) AS n_events
FROM s GROUP BY user_id, sid
ORDER BY user_id, session_start_us"""

  /** ARRAY JOIN analogue: explode document tokens, global top-50. */
  def topWords(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "documents")
      .select(explode(split($"text", " ")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"word")
      .limit(50)
  }

  val topWordsOracle: String = """
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
GROUP BY word ORDER BY n DESC, word LIMIT 50"""

  // ---- TPC-H-ish core operators -------------------------------------------

  /** Q1-style pricing summary: the scan+agg backbone; exercises
    * filter pushdown, partial aggregation, decimal-exact sums. */
  def q1Pricing(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "lineitem")
      .filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("2000-09-02 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(fx($"l_quantity", 1)).as("sum_qty"),
        (sum(fx($"l_extendedprice", 100)).cast("double") / lit(100.0)).as("sum_base_price"),
        revenueSum($"l_extendedprice", $"l_discount").as("sum_disc_price"),
        (sum(fx($"l_extendedprice", 100) * (lit(100L) - fx($"l_discount", 100)) *
             (lit(100L) + fx($"l_tax", 100))).cast("double") / lit(1.0e6)).as("sum_charge"),
        (sum(fx($"l_quantity", 1)).cast("double") / count(lit(1))).as("avg_qty"),
        ((sum(fx($"l_discount", 100)).cast("double") / count(lit(1))) / lit(100.0)).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1PricingOracle: String = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(floor(l_extendedprice*100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(SUM(CAST(floor(l_extendedprice*100.0 + 0.5) AS BIGINT) *
                (100 - CAST(floor(l_discount*100.0 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(SUM(CAST(floor(l_extendedprice*100.0 + 0.5) AS BIGINT) *
                (100 - CAST(floor(l_discount*100.0 + 0.5) AS BIGINT)) *
                (100 + CAST(floor(l_tax*100.0 + 0.5) AS BIGINT))) AS DOUBLE) / 1000000.0 AS sum_charge,
       CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
       (CAST(SUM(CAST(floor(l_discount*100.0 + 0.5) AS BIGINT)) AS DOUBLE) / count(*)) / 100.0 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""

  /** Q3-style: 3-way join + agg + top-10; customer filter prunes early. */
  def q3Shipping(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cutoff = lit(java.sql.Timestamp.valueOf("1998-03-15 00:00:00"))
    val cust = Tables(spark, sfDir, "customer").filter($"c_mktsegment" === "BUILDING")
    val ord = Tables(spark, sfDir, "orders").filter($"o_orderdate" < cutoff)
    val li = Tables(spark, sfDir, "lineitem").filter($"l_shipdate" > cutoff)
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(revenueSum($"l_extendedprice", $"l_discount").as("revenue"))
      .select($"l_orderkey", $"revenue",
        unix_micros($"o_orderdate".cast("timestamp")).as("o_orderdate_us"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val q3ShippingOracle: String = """
SELECT l_orderkey,
       CAST(SUM(CAST(floor(l_extendedprice*100.0 + 0.5) AS BIGINT) *
                (100 - CAST(floor(l_discount*100.0 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
       epoch_us(o_orderdate) AS o_orderdate_us
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  /** Q5-style: 6-way join with broadcast dims, group by nation. */
  def q5LocalSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val region = Tables(spark, sfDir, "region").filter($"r_name" === "ASIA")
    val nation = Tables(spark, sfDir, "nation")
    val cust = Tables(spark, sfDir, "customer")
    val supp = Tables(spark, sfDir, "supplier")
    val ord = Tables(spark, sfDir, "orders")
      .filter($"o_orderdate" >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
              $"o_orderdate" <  lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
    val li = Tables(spark, sfDir, "lineitem")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(revenueSum($"l_extendedprice", $"l_discount").as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q5LocalSupplierOracle: String = """
SELECT n_name,
       CAST(SUM(CAST(floor(l_extendedprice*100.0 + 0.5) AS BIGINT) *
                (100 - CAST(floor(l_discount*100.0 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name ORDER BY revenue DESC, n_name"""

  /** Window functions: top-3 orders per customer by price. */
  def windowTopOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables(spark, sfDir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  val windowTopOrdersOracle: String = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
ORDER BY o_custkey, rn"""

  /** ROLLUP grouping sets. */
  def rollupReturns(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), sum(fx($"l_quantity", 1)).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  val rollupReturnsOracle: String = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""

  /** Set operators: INTERSECT / EXCEPT / UNION ALL in one result. */
  def setOpsCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ck = Tables(spark, sfDir, "customer").select($"c_custkey")
    val ok = Tables(spark, sfDir, "orders").select($"o_custkey")
    val withOrders = ck.intersect(ok).select(lit("with_orders").as("segment"), $"c_custkey".as("custkey"))
    val noOrders = ck.except(ok).select(lit("no_orders").as("segment"), $"c_custkey".as("custkey"))
    withOrders.unionAll(noOrders).orderBy($"segment", $"custkey")
  }

  val setOpsCustomersOracle: String = """
SELECT 'with_orders' AS segment, c_custkey AS custkey
FROM (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders)
UNION ALL
SELECT 'no_orders' AS segment, c_custkey AS custkey
FROM (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders)
ORDER BY segment, custkey"""

  /** NOT EXISTS correlated subquery: customers with no order in 1998+. */
  def notExistsRecentOrders(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "customer").createOrReplaceTempView("sq_customer")
    Tables(spark, sfDir, "orders").createOrReplaceTempView("sq_orders")
    spark.sql("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM sq_customer c
      WHERE NOT EXISTS (
        SELECT 1 FROM sq_orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
      ORDER BY c_custkey""")
  }

  val notExistsRecentOrdersOracle: String = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
ORDER BY c_custkey"""

  /** Scalar subquery: orders priced above the global average. */
  def scalarSubqueryAboveAvg(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "orders").createOrReplaceTempView("sq2_orders")
    spark.sql("""
      SELECT o_orderkey, o_totalprice
      FROM sq2_orders
      WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(floor(o_totalprice*100.0 + 0.5) AS BIGINT)) AS DOUBLE)
                                         / (100.0 * count(*)) FROM sq2_orders)
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")
  }

  val scalarSubqueryAboveAvgOracle: String = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(floor(o_totalprice*100.0 + 0.5) AS BIGINT)) AS DOUBLE)
                                   / (100.0 * count(*)) FROM orders)
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""

  /** Semi/anti joins + distinct aggregate over part dims. */
  def partBrandStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val shipped = Tables(spark, sfDir, "lineitem").select($"l_partkey")
    Tables(spark, sfDir, "part")
      .join(shipped, $"p_partkey" === $"l_partkey", "left_semi")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n"), countDistinct($"p_type").as("n_types"),
        min($"p_retailprice").as("min_price"), max($"p_retailprice").as("max_price"))
      .orderBy($"p_brand")
  }

  val partBrandStatsOracle: String = """
SELECT p_brand, count(*) AS n, count(DISTINCT p_type) AS n_types,
       min(p_retailprice) AS min_price, max(p_retailprice) AS max_price
FROM part WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
GROUP BY p_brand ORDER BY p_brand"""

  /** Binned range join ([[graft.operators.RangeJoin]]): per event, how
    * many of the same user's events landed in the strictly-preceding
    * 5 minutes — the sliding-frequency feature (rate limiting, burst
    * detection) computed as an equi join on (user, time-bin) instead of
    * a per-pair range predicate. */
  def eventsWindowCount(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val win = 300000000L // 5 min in micros
    // one narrow row per event, consumed three times (points, intervals,
    // left-join anchor) — persist so the parquet scans once
    val ev = graft.operators.CacheRegistry.track(
      Tables(spark, sfDir, "events")
        .select($"event_id", $"user_id", unix_micros($"ts").as("t_us"))
        .persist())
    val intervals = ev.select($"event_id".as("target_id"), $"user_id",
      ($"t_us" - win).as("w_start"), $"t_us".as("w_end"))
    val counts = graft.operators.RangeJoin
      .pointsInIntervals(ev, intervals, Seq("user_id"), "t_us",
        "w_start", "w_end", bin = win)
      .groupBy($"target_id").agg(count(lit(1)).as("n"))
    intervals.select($"target_id")
      .join(counts, Seq("target_id"), "left_outer")
      .select($"target_id".as("event_id"),
        coalesce($"n", lit(0L)).as("n_prev_5min"))
      .orderBy($"event_id")
  }

  val eventsWindowCountOracle: String = """
SELECT e.event_id, CAST(count(p.event_id) AS BIGINT) AS n_prev_5min
FROM events e LEFT JOIN events p
  ON p.user_id = e.user_id
 AND epoch_us(p.ts) >= epoch_us(e.ts) - 300000000
 AND epoch_us(p.ts) < epoch_us(e.ts)
GROUP BY e.event_id ORDER BY e.event_id"""

  /** Skew-proof holistic aggregation ([[graft.operators.Salting]]): the
    * two-phase salted collect_set, whose single-task state stays bounded
    * at 1/salts of a hot key. Result is salt-invariant (sorted set). */
  def saltedUserTypes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sets = graft.operators.Salting.saltedCollectSet(
      Tables(spark, sfDir, "events").select($"user_id", $"event_type"),
      "user_id", "event_type", salts = 16)
    sets.select($"user_id",
        to_json(array_sort($"event_type_set")).as("types_json"))
      .orderBy($"user_id")
  }

  val saltedUserTypesOracle: String = """
SELECT user_id,
       CAST(to_json(list_sort(list(DISTINCT event_type))) AS VARCHAR) AS types_json
FROM events GROUP BY user_id ORDER BY user_id"""

  /** Exact per-type median of `value`, computed two independent ways in
    * the same row so one hash check proves both remaining holistic
    * shapes from [[graft.operators.Salting]]: `p50` via the
    * distributed histogram + cumulative-sum path ([[graft.operators.
    * Salting.exactPercentile]] — no holistic buffer anywhere) and
    * `p50_list` via the salted two-phase collect_list merge
    * ([[graft.operators.Salting.saltedSortedList]] — every aggregation
    * buffer bounded at 1/salts of the key). Both are the
    * lower-interpolation discrete percentile: an actual data element,
    * bit-comparable against the DuckDB oracle. */
  def saltedValueMedian(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events")
      .select($"event_type", $"value").filter($"value".isNotNull)
    val hist = graft.operators.Salting.exactPercentile(ev, "event_type", "value", 0.5)
    val viaList = graft.operators.Salting
      .saltedSortedList(ev, "event_type", "value", salts = 16)
      .select($"event_type",
        element_at($"value_list",
          (floor((size($"value_list") - 1) * 0.5) + 1).cast("int")).as("p50_list"))
    hist.join(viaList, "event_type").orderBy("event_type")
  }

  val saltedValueMedianOracle: String = """
WITH m AS (
  SELECT event_type,
         list_extract(list_sort(list(value)),
                      CAST(floor((count(*) - 1) * 0.5) AS BIGINT) + 1) AS med
  FROM events WHERE value IS NOT NULL GROUP BY event_type)
SELECT event_type, med AS p50, med AS p50_list FROM m ORDER BY event_type"""

  /** ClickHouse array higher-order surface (`arrayMap` / `arrayFilter` /
    * `arrayReduce` — what a migration leans on constantly): per user,
    * collect the sorted event values, transform (×2), filter (> median
    * of the corpus? no — a fixed 50.0 bound, engine-portable), and
    * aggregate (sum) — all as Spark's codegen'd lambda functions
    * `transform`/`filter`/`aggregate` over one collected array, proving
    * the HOF surface end-to-end against DuckDB's list lambdas. Values
    * ride fixed-point longs (cents) so no float crosses the boundary. */
  def sqlArrayHof(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "events")
      .select($"user_id",
        floor($"value" * 100 + 0.5).cast("long").as("cents"))
      .groupBy($"user_id")
      .agg(array_sort(collect_list($"cents")).as("vals"))
      .select($"user_id",
        size($"vals").as("n"),
        aggregate(transform($"vals", v => v * 2), lit(0L), _ + _).as("sum_doubled"),
        size(filter($"vals", _ > 5000L)).as("n_over_50"))
      .orderBy("user_id")
  }

  val sqlArrayHofOracle: String = """
WITH v AS (
  SELECT user_id,
         list_sort(list(CAST(floor(value * 100 + 0.5) AS BIGINT))) AS vals
  FROM events GROUP BY user_id)
SELECT user_id,
       CAST(len(vals) AS INTEGER) AS n,
       CAST(list_aggregate(list_transform(vals, v -> v * 2), 'sum') AS BIGINT)
         AS sum_doubled,
       CAST(len(list_filter(vals, v -> v > 5000)) AS INTEGER) AS n_over_50
FROM v ORDER BY user_id"""

  /** ClickHouse `histogram`-style fixed-width value histogram via
    * `width_bucket` (both engines implement the SQL-standard function):
    * event values over [0, 500) in 20 buckets, per event type. */
  def eventsValueHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "events")
      .filter($"value".isNotNull)
      .groupBy($"event_type",
        width_bucket($"value", lit(0.0), lit(500.0), lit(20)).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "bucket")
  }

  // DuckDB has no width_bucket; the oracle states Spark's exact
  // semantics INCLUDING the under/overflow buckets: bucket 0 below min,
  // numBuckets+1 at or above max, else floor(numBuckets·(v−min)/(max−min))+1.
  // (The sf0.1 gate caught the overflow case: values > 500 exist there —
  // 560.21 belongs in the clamp bucket 21, not floor-formula bucket 23.)
  val eventsValueHistogramOracle: String = """
SELECT event_type,
       CAST(CASE WHEN value < 0 THEN 0
                 WHEN value >= 500 THEN 21
                 ELSE floor(20 * value / 500.0) + 1 END AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM events WHERE value IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2"""

  /** ClickHouse `argMax` (the single most common migration idiom: "the
    * row's value at the key's latest timestamp"): last event type and
    * value per user, plus first (argMin) type, in ONE aggregation —
    * Spark's codegen'd `max_by`/`min_by`, no window, no self-join. Ties
    * on the timestamp are broken by the event struct's remaining fields
    * (deterministic on this data: event_id is unique). */
  def eventsArgMax(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events")
      .select($"user_id", $"event_id", $"event_type", $"value",
        unix_micros($"ts").as("ts_us"))
    // tie-break: order by (ts_us, event_id) — max_by/min_by take a
    // struct ordering key so equal timestamps can't flap between runs
    ev.groupBy($"user_id")
      .agg(
        max_by($"event_type", struct($"ts_us", $"event_id")).as("last_type"),
        max_by($"value", struct($"ts_us", $"event_id")).as("last_value"),
        min_by($"event_type", struct($"ts_us", $"event_id")).as("first_type"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  val eventsArgMaxOracle: String = """
WITH r AS (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
           ORDER BY epoch_us(ts) DESC, event_id DESC) AS rl,
         row_number() OVER (PARTITION BY user_id
           ORDER BY epoch_us(ts), event_id) AS rf,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events)
SELECT user_id,
       max(CASE WHEN rl = 1 THEN event_type END) AS last_type,
       max(CASE WHEN rl = 1 THEN value END) AS last_value,
       max(CASE WHEN rf = 1 THEN event_type END) AS first_type,
       CAST(max(n) AS BIGINT) AS n_events
FROM r GROUP BY user_id ORDER BY user_id"""

  /** ClickHouse `quantilesExact(0.25, 0.5, 0.75, 0.95)(value)`: all four
    * exact percentiles per event type from ONE histogram+cumsum pass
    * ([[graft.operators.Salting.exactPercentiles]] — extra percentiles
    * are extra filters, not extra scans). */
  def saltedValueQuartiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events")
      .select($"event_type", $"value").filter($"value".isNotNull)
    graft.operators.Salting.exactPercentiles(ev, "event_type", "value",
        Seq(0.25, 0.5, 0.75, 0.95))
      .orderBy("event_type")
  }

  val saltedValueQuartilesOracle: String = """
WITH m AS (
  SELECT event_type, list_sort(list(value)) AS vs, count(*) AS n
  FROM events WHERE value IS NOT NULL GROUP BY event_type)
SELECT event_type,
       list_extract(vs, CAST(floor((n - 1) * 0.25) AS BIGINT) + 1) AS p25,
       list_extract(vs, CAST(floor((n - 1) * 0.5) AS BIGINT) + 1) AS p50,
       list_extract(vs, CAST(floor((n - 1) * 0.75) AS BIGINT) + 1) AS p75,
       list_extract(vs, CAST(floor((n - 1) * 0.95) AS BIGINT) + 1) AS p95
FROM m ORDER BY event_type"""

  /** WEIGHTED exact median (ClickHouse `quantileExactWeighted`): p50 of
    * lineitem extended price weighted by quantity — the element whose
    * cumulative weight first reaches floor((W−1)·0.5)+1. Same
    * no-holistic-buffer decomposition as [[saltedValueMedian]]; the
    * oracle replays the cumulative-weight walk in SQL. */
  def saltedValueMedianWeighted(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables(spark, sfDir, "lineitem")
      .select($"l_returnflag", $"l_extendedprice", $"l_quantity")
    graft.operators.Salting.exactPercentileWeighted(
        li, "l_returnflag", "l_extendedprice", 0.5, weight = Some("l_quantity"))
      .orderBy("l_returnflag")
  }

  val saltedValueMedianWeightedOracle: String = """
WITH c AS (
  SELECT l_returnflag, l_extendedprice AS v,
         SUM(CAST(l_quantity AS BIGINT)) AS w
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND CAST(l_quantity AS BIGINT) > 0
  GROUP BY 1, 2),
r AS (
  SELECT l_returnflag, v, w,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM c)
SELECT l_returnflag, v AS p50
FROM r
WHERE cum - w < FLOOR((tot - 1) * 0.5) + 1 AND FLOOR((tot - 1) * 0.5) + 1 <= cum
ORDER BY l_returnflag"""

  /** Manual salted fact⨝dim join ([[graft.operators.Salting.skewJoin]]):
    * lineitem (fact, potentially key-skewed) against orders (dim side,
    * replicated ×salts) — result must equal the plain inner join, which
    * is exactly what the oracle computes. */
  def saltedOrderLines(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey".as("orderkey"),
        floor($"l_quantity" + 0.5).cast("long").as("qty"))
    val ord = Tables(spark, sfDir, "orders")
      .select($"o_orderkey".as("orderkey"), $"o_orderpriority")
    // hotThreshold 1000: TPC-H orders have ≤7 lines, so the pre-pass
    // finds no hot keys and the dim replicates ×1 — the cold path IS the
    // plain join plus one map-side-combined count scan, the honest cost
    // of skew insurance on an unskewed input
    graft.operators.Salting.skewJoin(li, ord, Seq("orderkey"),
      salts = 8, hotThreshold = 1000L)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"), sum($"qty").as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  val saltedOrderLinesOracle: String = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1"""

  /** ClickHouse `ASOF JOIN` surface: for every event, the same user's most
    * recent purchase at or before it (events before the user's first
    * purchase stay null). One shuffle + sort via the union–backfill
    * pattern ([[graft.operators.AsofJoin]]). */
  def eventsAsofPurchase(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"ts", $"event_type")
    val purchases = Tables(spark, sfDir, "events")
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts",
        unix_micros($"ts").as("last_purchase_us"), $"value".as("purchase_value"))
    graft.operators.AsofJoin.asofJoin(ev, purchases, "user_id", "ts", "ts",
        Seq("last_purchase_us", "purchase_value"))
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
        $"event_type", $"last_purchase_us", $"purchase_value")
      .orderBy($"event_id")
  }

  val eventsAsofPurchaseOracle: String = """
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, e.event_type,
       p.last_purchase_us, p.purchase_value
FROM events e
ASOF LEFT JOIN (
  SELECT user_id, ts, epoch_us(ts) AS last_purchase_us, value AS purchase_value
  FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts >= p.ts
ORDER BY e.event_id"""

  /** [[eventsAsofPurchase]] with a 7-day match tolerance (pandas
    * `merge_asof(tolerance=…)`): a purchase older than the bound yields
    * NULLS — it does not fall through to an even older one. The oracle
    * is the native ASOF JOIN with the too-old match nulled by CASE,
    * which is exactly that semantics. */
  def eventsAsofPurchaseTol(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"ts", $"event_type")
    val purchases = Tables(spark, sfDir, "events")
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts",
        unix_micros($"ts").as("last_purchase_us"), $"value".as("purchase_value"))
    graft.operators.AsofJoin.asofJoin(ev, purchases, "user_id", "ts", "ts",
        Seq("last_purchase_us", "purchase_value"),
        tolerance = Some(7L * 24 * 3600 * 1000000))
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
        $"event_type", $"last_purchase_us", $"purchase_value")
      .orderBy($"event_id")
  }

  val eventsAsofPurchaseTolOracle: String = """
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, e.event_type,
       CASE WHEN epoch_us(e.ts) - p.last_purchase_us <= 604800000000
            THEN p.last_purchase_us END AS last_purchase_us,
       CASE WHEN epoch_us(e.ts) - p.last_purchase_us <= 604800000000
            THEN p.purchase_value END AS purchase_value
FROM events e
ASOF LEFT JOIN (
  SELECT user_id, ts, epoch_us(ts) AS last_purchase_us, value AS purchase_value
  FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts >= p.ts
ORDER BY e.event_id"""

  /** Exact table profiling (ClickHouse `uniqExact`/min/max-style column
    * stats in one scan): row count, exact distincts, null counts, value
    * ranges. One pass over the fact table, partial aggregation map-side —
    * the shuffle carries one row per partition. */
  def profileLineitem(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      countDistinct($"l_orderkey").as("n_orders"),
      countDistinct($"l_partkey").as("n_parts"),
      countDistinct($"l_returnflag").as("n_flags"),
      count(when($"l_returnflag".isNull, 1)).as("n_null_flag"),
      min($"l_quantity").as("min_qty"), max($"l_quantity").as("max_qty"),
      // parquet reads the column as TIMESTAMP_NTZ; the UTC session makes
      // the cast a pure reinterpretation, matching DuckDB's epoch_us
      unix_micros(min($"l_shipdate").cast("timestamp")).as("min_ship_us"),
      unix_micros(max($"l_shipdate").cast("timestamp")).as("max_ship_us"))
  }

  val profileLineitemOracle: String = """
SELECT count(*) AS n_rows,
       count(DISTINCT l_orderkey) AS n_orders,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_returnflag) AS n_flags,
       CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_flag,
       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
       epoch_us(min(l_shipdate)) AS min_ship_us,
       epoch_us(max(l_shipdate)) AS max_ship_us
FROM lineitem"""

  /** Sketch-accuracy proof for the APPROXIMATE profiling surface
    * (ClickHouse `uniq()` / `quantile()` analogues): HLL++
    * `approx_count_distinct` must land within 3× its configured 2% rsd of
    * the exact distinct count, and `percentile_approx`(p50) must lie
    * between the exact p45 and p55 — so the sketches stay registered with
    * an honest, DuckDB-checkable bound (same violation-query pattern as
    * the LSH family). */
  def profileSketchViolations(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables(spark, sfDir, "lineitem")
    li.agg(
        approx_count_distinct($"l_partkey", 0.02).as("approx_parts"),
        countDistinct($"l_partkey").as("exact_parts"),
        percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("approx_p50"),
        expr("percentile(l_extendedprice, 0.45)").as("p45"),
        expr("percentile(l_extendedprice, 0.55)").as("p55"))
      .select(
        (abs($"approx_parts" - $"exact_parts").cast("double") / $"exact_parts")
          .as("rel_err"),
        $"approx_p50", $"p45", $"p55")
      .select(
        count(when($"rel_err" > 0.06 || $"approx_p50" < $"p45" ||
          $"approx_p50" > $"p55", 1)).as("n_violations"),
        least(count(lit(1)), lit(1L)).as("has_pairs"))
  }

  /** Distinct users per event type answered from a MERGEABLE sketch
    * cube ([[graft.operators.Sketches]]): raw events are sketched once
    * into per-(type, shard) HLL rows, then the answer is a union over
    * the cube — the pre-aggregation shape that answers distinct-count
    * roll-ups at 100 TB without rescanning the fact table. Approximate
    * by construction → no DuckDB oracle; accuracy is driver-gated by
    * [[eventsDistinctHllViolations]] and the exact twin
    * [[eventsDistinctExact]] is oracle-checked. */
  def eventsDistinctHll(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir, "events")
    graft.operators.Sketches.hllRollup(
        graft.operators.Sketches.hllCube(ev, Seq("event_type"), "user_id"),
        Seq("event_type"), estimateCol = "approx_users")
      .orderBy("event_type")
  }

  /** Exact twin of [[eventsDistinctHll]]. */
  def eventsDistinctExact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "events")
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy("event_type")
  }

  val eventsDistinctExactOracle: String = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1 ORDER BY 1"""

  /** Accuracy gate for the sketch cube: every per-type estimate — and a
    * SECOND roll-up from a re-sharded cube (different merge topology) —
    * must land within 5% of exact (lgK 12 → ~1.6% rsd; 3σ). The
    * re-shard leg pins the no-accuracy-loss-from-pre-aggregation
    * contract the operator's scaladoc states. */
  def eventsDistinctHllViolations(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events")
    val est = eventsDistinctHll(spark, sfDir)
    val resharded = graft.operators.Sketches.hllRollup(
        graft.operators.Sketches.hllCube(ev, Seq("event_type"), "user_id",
          shards = 7),
        Seq("event_type"), estimateCol = "approx_users_b")
    val exact = eventsDistinctExact(spark, sfDir)
    est.join(resharded, "event_type").join(exact, "event_type")
      .select(
        (abs($"approx_users" - $"n_users").cast("double") / $"n_users")
          .as("rel_a"),
        (abs($"approx_users_b" - $"n_users").cast("double") / $"n_users")
          .as("rel_b"))
      .select(
        count(when($"rel_a" > 0.05 || $"rel_b" > 0.05, 1)).as("n_violations"),
        least(count(lit(1)), lit(1L)).as("has_pairs"))
  }

  /** Audience overlap between every pair of event types from Theta
    * sketches ([[graft.operators.Sketches.thetaOverlap]]): |A|, |B|,
    * |A∩B|, |A∖B| — set algebra over one KB-sized sketch row per type,
    * where the exact answer is a per-pair self-join of the fact table.
    * At driver scale the sketches hold fewer than 2^lgK entries and are
    * in EXACT mode; the violations gate still prices the full 5% bound
    * so the estimation-mode contract is what's registered. */
  def eventsAudienceTheta(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir, "events")
    graft.operators.Sketches.thetaOverlap(
        graft.operators.Sketches.thetaSketches(ev, Seq("event_type"), "user_id"),
        "event_type")
      .orderBy("a", "b")
  }

  /** Exact twin of [[eventsAudienceTheta]] — pairwise distinct-user
    * set measures via a distinct-pairs self-join. */
  def eventsAudienceExact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = Tables(spark, sfDir, "events")
      .select($"event_type", $"user_id").distinct()
    val c = d.groupBy($"event_type").agg(count(lit(1)).as("n"))
    val inter = d.as("x").join(d.as("y"),
        $"x.user_id" === $"y.user_id" && $"x.event_type" < $"y.event_type")
      .groupBy($"x.event_type".as("a"), $"y.event_type".as("b"))
      .agg(count(lit(1)).as("n_intersect"))
    inter
      .join(c.select($"event_type".as("a"), $"n".as("n_a")), "a")
      .join(c.select($"event_type".as("b"), $"n".as("n_b")), "b")
      .select($"a", $"b", $"n_a", $"n_b", $"n_intersect",
        ($"n_a" - $"n_intersect").as("n_only_a"))
      .orderBy("a", "b")
  }

  val eventsAudienceExactOracle: String = """
WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
i AS (SELECT x.event_type AS a, y.event_type AS b,
             CAST(count(*) AS BIGINT) AS n_intersect
      FROM d x JOIN d y ON x.user_id = y.user_id AND x.event_type < y.event_type
      GROUP BY 1, 2)
SELECT i.a, i.b, ca.n AS n_a, cb.n AS n_b, i.n_intersect,
       ca.n - i.n_intersect AS n_only_a
FROM i JOIN c ca ON ca.event_type = i.a JOIN c cb ON cb.event_type = i.b
ORDER BY 1, 2"""

  /** 5% gate on every Theta set-algebra measure vs the exact twin. */
  def eventsAudienceThetaViolations(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val est = eventsAudienceTheta(spark, sfDir)
    val exact = eventsAudienceExact(spark, sfDir)
      .withColumnsRenamed(Map("n_a" -> "e_a", "n_b" -> "e_b",
        "n_intersect" -> "e_int", "n_only_a" -> "e_only"))
    def rel(e: Column, x: Column): Column =
      abs(e.cast("double") - x) / greatest(x.cast("double"), lit(1.0))
    est.join(exact, Seq("a", "b"))
      .select(
        count(when(
          rel($"n_a", $"e_a") > 0.05 || rel($"n_b", $"e_b") > 0.05 ||
          rel($"n_intersect", $"e_int") > 0.05 ||
          rel($"n_only_a", $"e_only") > 0.05, 1)).as("n_violations"),
        least(count(lit(1)), lit(1L)).as("has_pairs"))
  }

  /** Per-type value quantiles answered from a mergeable KLL sketch cube
    * ([[graft.operators.Sketches.kllCube]]) — the order-statistics
    * sibling of the HLL cube; the exact twin is the hash-green
    * `salted_value_quartiles` (histogram+cumsum exact percentiles). */
  def eventsValueKll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events")
      .select($"event_type", $"value").filter($"value".isNotNull)
    graft.operators.Sketches.kllRollup(
        graft.operators.Sketches.kllCube(ev, Seq("event_type"), "value"),
        Seq("event_type"), Seq(0.5, 0.9, 0.99))
      .orderBy("event_type")
  }

  /** KLL rank-error gate: the sketch's p-quantile value must lie
    * between the EXACT (p−3ε) and (p+3ε) quantiles (ε≈1.65% at the
    * default k=200 — rank error, not value error, which is why the
    * bound brackets in rank space). */
  def eventsValueKllViolations(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val est = eventsValueKll(spark, sfDir)
    val bounds = Tables(spark, sfDir, "events")
      .filter($"value".isNotNull)
      .groupBy($"event_type")
      .agg(
        expr("percentile(value, 0.45)").as("lo50"),
        expr("percentile(value, 0.55)").as("hi50"),
        expr("percentile(value, 0.85)").as("lo90"),
        expr("percentile(value, 0.95)").as("hi90"),
        expr("percentile(value, 0.94)").as("lo99"),
        max($"value").as("hi99"))
    est.join(bounds, "event_type")
      .select(
        count(when($"p50" < $"lo50" || $"p50" > $"hi50" ||
          $"p90" < $"lo90" || $"p90" > $"hi90" ||
          $"p99" < $"lo99" || $"p99" > $"hi99", 1)).as("n_violations"),
        least(count(lit(1)), lit(1L)).as("has_pairs"))
  }
}
