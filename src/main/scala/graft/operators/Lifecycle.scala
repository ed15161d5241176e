package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** User-lifecycle survival and strict-window conversion operators.
  *
  *   - q_nelson_aalen — the Nelson–Aalen cumulative-hazard estimator
  *     Ĥ(t) = Σ_{s≤t} d_s/n_s over user lifetimes (days between first
  *     and last activity). Kaplan–Meier's Ŝ(t) = Π(1−d/n) needs a
  *     sequential PRODUCT (not parallelizable exactly in integers);
  *     Nelson–Aalen is the estimator that factors into a prefix SUM of
  *     per-day integer terms — so it windows exactly, stays
  *     engine-deterministic in ppm, and Ŝ ≈ exp(−Ĥ) recovers the curve
  *     downstream. Risk sets come from one lifetime histogram +
  *     bounded-|days| windows, never raw-user windows.
  *   - q_funnel_strict_window — ordered funnel where each step must
  *     land within [[STEP_GAP_MS]] of the PREVIOUS step's qualifying
  *     time (q_event_funnel gates only on order; marketing funnels
  *     usually require recency too). Same min-time gating construction,
  *     all shuffles user-keyed.
  *
  *   - q_funnel_by_arm — the order-gated funnel split by the hash
  *     experiment arm (arm derives from user_id, so it rides the
  *     user-keyed aggregates for free).
  *   - q_open_intervals — sweep-line concurrency counting: O(rows)
  *     ±1 deltas + one bounded-|days| prefix sum, instead of the
  *     O(rows·span) per-day interval explode.
  *
  * 100 TB posture: all user-keyed aggregates; the only windows run
  * over bounded day-grain tables (lifetime histogram, delta changelog —
  * ≤ observation-span rows at any corpus size).
  */
object Lifecycle {

  /** Strict funnel: each step within 1 h of the previous one. */
  private val STEP_GAP_MS = 3600000L

  /** q_funnel_by_arm hash seed (distinct stream from the SRM and
    * conversion splits).
    */
  private val FUNNEL_AB_SEED = 31

  /** q_open_intervals: each order stays open 7 days. */
  private val OPEN_SPAN_DAYS = 7

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── Nelson–Aalen cumulative hazard over activity lifetimes ─────────
    "q_nelson_aalen" -> { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      val life = e.select(col("user_id"), Tables.epochMs(e).as("ms"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"))
        .selectExpr("(last_ms - first_ms) div 86400000 AS t")
      val hist = life.groupBy(col("t")).agg(count(lit(1)).as("d"))
      val wOrd = Window.orderBy(col("t"))
      val total = hist.agg(sum(col("d")).as("n_total"))
      // n_at_risk(t) = N − Σ_{s<t} d_s  (suffix sum via prefix-before)
      hist.crossJoin(broadcast(total))
        .withColumn("n_at_risk",
          col("n_total") - coalesce(
            sum(col("d")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
        .withColumn("term", expr("d * 1000000 div n_at_risk"))
        .withColumn("h_ppm",
          sum(col("term")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("t"), col("n_at_risk"), col("d"), col("h_ppm"))
    },

    // ── strict-window ordered funnel (≤1 h between steps) ──────────────
    "q_funnel_strict_window" -> { (s, dir) =>
      val e0 = Tables.load(s, dir, "events")
      val e = e0.select(col("user_id"), col("event_type"),
        Tables.epochMs(e0).as("ms"))
      val t1 = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ms")).as("t1"))
      val t2 = e.filter(col("event_type") === "click")
        .join(t1, Seq("user_id"))
        .filter(col("ms") >= col("t1") &&
          col("ms") <= col("t1") + STEP_GAP_MS)
        .groupBy(col("user_id")).agg(min(col("ms")).as("t2"))
      val t3 = e.filter(col("event_type") === "purchase")
        .join(t2, Seq("user_id"))
        .filter(col("ms") >= col("t2") &&
          col("ms") <= col("t2") + STEP_GAP_MS)
        .groupBy(col("user_id")).agg(min(col("ms")).as("t3"))
      val c1 = t1.agg(count(lit(1)).as("n_users"))
        .selectExpr("1L AS step", "'view' AS step_name", "n_users")
      val c2 = t2.agg(count(lit(1)).as("n_users"))
        .selectExpr("2L AS step", "'click' AS step_name", "n_users")
      val c3 = t3.agg(count(lit(1)).as("n_users"))
        .selectExpr("3L AS step", "'purchase' AS step_name", "n_users")
      c1.unionByName(c2).unionByName(c3)
    },

    // ── ordered funnel split by experiment arm ─────────────────────────
    // The per-arm conversion readout a feature experiment actually
    // reads: the q_event_funnel order-gating, grouped by the hash arm.
    // Arm derives from user_id, so it rides every user-keyed aggregate
    // for free — no extra shuffle vs the ungrouped funnel.
    "q_funnel_by_arm" -> { (s, dir) =>
      val e0 = Tables.load(s, dir, "events")
      val e = e0.select(col("user_id"), col("event_type"),
          Tables.epochMs(e0).as("ms"))
        .withColumn("arm",
          Dedup.hash32(FUNNEL_AB_SEED, col("user_id").cast("string")) % 2)
      val t1 = e.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("arm")).agg(min(col("ms")).as("t1"))
      val t2 = e.filter(col("event_type") === "click")
        .join(t1.select(col("user_id"), col("t1")), Seq("user_id"))
        .filter(col("ms") >= col("t1"))
        .groupBy(col("user_id"), col("arm")).agg(min(col("ms")).as("t2"))
      val t3 = e.filter(col("event_type") === "purchase")
        .join(t2.select(col("user_id"), col("t2")), Seq("user_id"))
        .filter(col("ms") >= col("t2"))
        .groupBy(col("user_id"), col("arm")).agg(min(col("ms")).as("t3"))
      def cnt(df: DataFrame, step: Long, nm: String) =
        df.groupBy(col("arm")).agg(count(lit(1)).as("n_users"))
          .select(col("arm"), lit(step).as("step"), lit(nm).as("step_name"),
            col("n_users"))
      cnt(t1, 1L, "view").unionByName(cnt(t2, 2L, "click"))
        .unionByName(cnt(t3, 3L, "purchase"))
    },

    // ── sweep-line open-interval counting ──────────────────────────────
    // How many orders are OPEN each day ([orderdate, +7d) windows):
    // the concurrency question interval explode answers in O(rows·span)
    // — this is the O(rows) sweep: +1 at open, −1 at close, day-keyed
    // delta aggregate, then one prefix sum over the bounded |days|
    // table. Only days where the count CHANGES appear (the changelog
    // convention — consumers step-interpolate).
    "q_open_intervals" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .select(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("day"))
      val deltas = o.select(col("day"), lit(1L).as("delta"))
        .union(o.select((col("day") + OPEN_SPAN_DAYS).as("day"),
          lit(-1L).as("delta")))
        .groupBy(col("day")).agg(sum(col("delta")).as("delta"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      deltas.withColumn("n_open", sum(col("delta")).over(w))
        .select(col("day"), col("delta"), col("n_open"))
    })

  val oracle: Map[String, String] = Map(

    "q_nelson_aalen" ->
      """WITH life AS (SELECT user_id,
        |    (max(epoch_ms(ts)) - min(epoch_ms(ts))) // 86400000 AS t
        |  FROM events GROUP BY 1),
        |hist AS (SELECT t, count(*) AS d FROM life GROUP BY 1),
        |tot AS (SELECT sum(d) AS n_total FROM hist),
        |risk AS (SELECT t, d,
        |    CAST(n_total - coalesce(sum(d) OVER (ORDER BY t ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n_at_risk
        |  FROM hist, tot)
        |SELECT t, n_at_risk, d,
        |  CAST(sum(d * 1000000 // n_at_risk) OVER (ORDER BY t ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS h_ppm
        |FROM risk""".stripMargin,

    "q_funnel_strict_window" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms
         |  FROM events),
         |t1 AS (SELECT user_id, min(ms) AS t1 FROM e
         |  WHERE event_type = 'view' GROUP BY 1),
         |t2 AS (SELECT e.user_id, min(e.ms) AS t2 FROM e
         |  JOIN t1 ON e.user_id = t1.user_id
         |  WHERE e.event_type = 'click'
         |    AND e.ms >= t1.t1 AND e.ms <= t1.t1 + $STEP_GAP_MS
         |  GROUP BY 1),
         |t3 AS (SELECT e.user_id, min(e.ms) AS t3 FROM e
         |  JOIN t2 ON e.user_id = t2.user_id
         |  WHERE e.event_type = 'purchase'
         |    AND e.ms >= t2.t2 AND e.ms <= t2.t2 + $STEP_GAP_MS
         |  GROUP BY 1)
         |SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
         |  (SELECT count(*) FROM t1) AS n_users
         |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM t2)
         |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM t3)"""
        .stripMargin,

    "q_funnel_by_arm" -> {
      val arm = graft.operators.Dedup
        .hash32Sql(FUNNEL_AB_SEED, "CAST(user_id AS VARCHAR)")
      s"""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms,
         |    ($arm) % 2 AS arm
         |  FROM events),
         |t1 AS (SELECT user_id, arm, min(ms) AS t1 FROM e
         |  WHERE event_type = 'view' GROUP BY 1, 2),
         |t2 AS (SELECT e.user_id, e.arm, min(e.ms) AS t2 FROM e
         |  JOIN t1 ON e.user_id = t1.user_id
         |  WHERE e.event_type = 'click' AND e.ms >= t1.t1
         |  GROUP BY 1, 2),
         |t3 AS (SELECT e.user_id, e.arm, min(e.ms) AS t3 FROM e
         |  JOIN t2 ON e.user_id = t2.user_id
         |  WHERE e.event_type = 'purchase' AND e.ms >= t2.t2
         |  GROUP BY 1, 2)
         |SELECT arm, CAST(1 AS BIGINT) AS step, 'view' AS step_name,
         |  count(*) AS n_users FROM t1 GROUP BY 1
         |UNION ALL SELECT arm, 2, 'click', count(*) FROM t2 GROUP BY 1
         |UNION ALL SELECT arm, 3, 'purchase', count(*) FROM t3
         |GROUP BY 1""".stripMargin
    },

    "q_open_intervals" ->
      s"""WITH o AS (SELECT datediff('day', DATE '1970-01-01',
         |    CAST(o_orderdate AS DATE)) AS day FROM orders),
         |deltas AS (SELECT day, sum(delta) AS delta FROM (
         |    SELECT day, 1 AS delta FROM o
         |    UNION ALL
         |    SELECT day + $OPEN_SPAN_DAYS, -1 FROM o) d
         |  GROUP BY 1)
         |SELECT CAST(day AS BIGINT) AS day,
         |  CAST(delta AS BIGINT) AS delta,
         |  CAST(sum(delta) OVER (ORDER BY day ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS n_open
         |FROM deltas""".stripMargin)
}
