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
  * 100 TB posture: both are user-keyed aggregates; the only windows run
  * over the lifetime histogram (≤ observation-span rows at any corpus
  * size).
  */
object Lifecycle {

  /** Strict funnel: each step within 1 h of the previous one. */
  private val STEP_GAP_MS = 3600000L

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
        .stripMargin)
}
