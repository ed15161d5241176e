package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Privacy-risk audits over quasi-identifiers (Sweeney, "k-Anonymity:
  * A Model for Protecting Privacy", 2002; Machanavajjhala et al.,
  * "l-Diversity", ICDE'06) — the release-gate questions a training-data
  * pipeline must answer before shipping a table that joins against the
  * outside world: how small is the smallest quasi-identifier cohort
  * (re-identification risk), and how concentrated is the sensitive
  * attribute inside each cohort (attribute-disclosure risk).
  *
  * Quasi-identifier here: (nation, market segment); sensitive
  * attribute: account-balance sign band. Complements q_pii_scrub /
  * q_blocklist_redact (CONTENT rules) with the COHORT-STRUCTURE rules.
  *
  * 100 TB posture: both are one QI-keyed aggregate (+ a second
  * |cohorts|-row fold for the table-level readout) — cohort counts are
  * bounded by the QI domain, never row count. All shares in bp with
  * non-negative integer division.
  */
object Privacy {

  /** k-anonymity risk threshold: cohorts smaller than this are risky. */
  private val K_THRESHOLD = 5L

  /** Sensitive attribute banding: acctbal sign (neg / small / large). */
  private val SENSITIVE_BAND =
    "CASE WHEN c_acctbal < 0 THEN 'neg'" +
      " WHEN c_acctbal < 5000 THEN 'small' ELSE 'large' END"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── per-cohort k-anonymity readout + table-level risk shares ───────
    "q_k_anonymity" -> { (s, dir) =>
      val cohorts = Tables.load(s, dir, "customer")
        .groupBy(col("c_nationkey").cast("long").as("nationkey"),
          col("c_mktsegment").as("mktsegment"))
        .agg(count(lit(1)).as("cohort_n"))
      val table = cohorts.agg(min(col("cohort_n")).as("k_anonymity"),
        sum(col("cohort_n")).as("n_rows"),
        sum(when(col("cohort_n") < K_THRESHOLD, col("cohort_n"))
          .otherwise(0L)).as("risky_rows"))
      cohorts.crossJoin(broadcast(table))
        .select(col("nationkey"), col("mktsegment"), col("cohort_n"),
          col("k_anonymity"),
          when(col("cohort_n") < K_THRESHOLD, lit(true))
            .otherwise(lit(false)).as("is_risky"),
          expr("CASE WHEN n_rows = 0 THEN CAST(NULL AS BIGINT)" +
            " ELSE risky_rows * 10000 div n_rows END").as("risky_bp"))
    },

    // ── l-diversity of the sensitive band inside each cohort ───────────
    // Distinct sensitive values per cohort plus the dominant value's
    // share (a cohort can be l-diverse yet 99 % one value — both
    // numbers matter).
    "q_l_diversity" -> { (s, dir) =>
      val rows = Tables.load(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("nationkey"),
          col("c_mktsegment").as("mktsegment"),
          expr(SENSITIVE_BAND).as("band"))
      val bandCounts = rows
        .groupBy(col("nationkey"), col("mktsegment"), col("band"))
        .agg(count(lit(1)).as("bn"))
      bandCounts.groupBy(col("nationkey"), col("mktsegment"))
        .agg(count(lit(1)).as("l_distinct"),
          sum(col("bn")).as("cohort_n"),
          max(col("bn")).as("dominant_n"))
        .withColumn("dominant_bp",
          expr("dominant_n * 10000 div cohort_n"))
    })

  val oracle: Map[String, String] = Map(

    "q_k_anonymity" ->
      s"""WITH cohorts AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
         |    c_mktsegment AS mktsegment, count(*) AS cohort_n
         |  FROM customer GROUP BY 1, 2),
         |t AS (SELECT min(cohort_n) AS k_anonymity,
         |    sum(cohort_n) AS n_rows,
         |    sum(CASE WHEN cohort_n < $K_THRESHOLD THEN cohort_n
         |      ELSE 0 END) AS risky_rows
         |  FROM cohorts)
         |SELECT c.nationkey, c.mktsegment, c.cohort_n,
         |  CAST(t.k_anonymity AS BIGINT) AS k_anonymity,
         |  c.cohort_n < $K_THRESHOLD AS is_risky,
         |  CASE WHEN t.n_rows = 0 THEN CAST(NULL AS BIGINT)
         |    ELSE CAST(t.risky_rows * 10000 // t.n_rows AS BIGINT)
         |  END AS risky_bp
         |FROM cohorts c, t""".stripMargin,

    "q_l_diversity" ->
      s"""WITH rows0 AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
         |    c_mktsegment AS mktsegment,
         |    $SENSITIVE_BAND AS band
         |  FROM customer),
         |bc AS (SELECT nationkey, mktsegment, band, count(*) AS bn
         |  FROM rows0 GROUP BY 1, 2, 3)
         |SELECT nationkey, mktsegment, count(*) AS l_distinct,
         |  CAST(sum(bn) AS BIGINT) AS cohort_n, max(bn) AS dominant_n,
         |  CAST(max(bn) * 10000 // sum(bn) AS BIGINT) AS dominant_bp
         |FROM bc GROUP BY 1, 2""".stripMargin)
}
