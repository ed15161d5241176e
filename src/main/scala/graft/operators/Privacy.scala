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

  /** t-closeness threshold (t = 0.2 in bp): cohorts whose sensitive
    * distribution sits ≥ this TVD from the global one are flagged.
    */
  private val T_CLOSE_BP = 2000L

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
    },

    // ── t-closeness: cohort vs global sensitive distribution ───────────
    // Li et al., "t-Closeness" (ICDE'07): a cohort can be k-anonymous
    // and l-diverse yet still leak if its sensitive distribution sits
    // far from the table's. Categorical distance = total variation
    // TVD = ½·Σ_v |p_cohort(v) − p_global(v)|, computed as ONE exact
    // integer division per cohort: Σ|bn·N − gn·C|·10⁴ div (2·C·N) in
    // DECIMAL(38,0) (HUGEINT on the oracle) — bn·N crosses int64 past
    // ~3·10⁹ rows, same headroom rule as q_labeler_kappa. Bands absent
    // from a cohort still contribute (cohort×band grid via a broadcast
    // |bands|-row dim), so a cohort missing a whole band reads as FAR,
    // not as matching.
    "q_t_closeness" -> { (s, dir) =>
      val rows = Tables.load(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("nationkey"),
          col("c_mktsegment").as("mktsegment"),
          expr(SENSITIVE_BAND).as("band"))
      val bn = rows
        .groupBy(col("nationkey"), col("mktsegment"), col("band"))
        .agg(count(lit(1)).as("bn"))
      val cohorts = bn.groupBy(col("nationkey"), col("mktsegment"))
        .agg(sum(col("bn")).as("cohort_n"))
      val g = rows.groupBy(col("band")).agg(count(lit(1)).as("gn"))
      val tot = g.agg(sum(col("gn")).as("n_rows"))
      // bn is |QI domain|·|bands| rows — bounded by construction, so
      // the grid attach broadcasts at any corpus size
      cohorts.crossJoin(broadcast(g))
        .join(broadcast(bn), Seq("nationkey", "mktsegment", "band"),
          "left")
        .na.fill(0L, Seq("bn"))
        .crossJoin(broadcast(tot))
        .withColumn("term", expr("abs(CAST(bn AS DECIMAL(38,0)) * n_rows" +
          " - CAST(gn AS DECIMAL(38,0)) * cohort_n)"))
        .groupBy(col("nationkey"), col("mktsegment"))
        .agg(max(col("cohort_n")).as("cohort_n"),
          expr("CAST(sum(term) * 10000 div" +
            " (2 * CAST(max(cohort_n) AS DECIMAL(38,0)) * max(n_rows))" +
            " AS BIGINT)").as("tvd_bp"))
        .withColumn("is_far", col("tvd_bp") >= T_CLOSE_BP)
    },

    // ── binomial-mechanism noisy count release ─────────────────────────
    // The released-statistics twin of the cohort audits: per-cohort
    // counts with additive centered-binomial noise (the binomial
    // mechanism, Dwork et al. CCS'06 — Binomial(60, ½) − 30, σ ≈ 3.9),
    // noise drawn by popcount of the cohort's 60-bit md5 hash so the
    // whole mechanism is integer bit arithmetic both engines share.
    // Contract honesty: a SEEDED draw is reproducible plumbing, not
    // privacy — production swaps the hash for real entropy (the
    // MediaDecoder-style injectable step); the gate proves the
    // mechanism arithmetic (sensitivity-1 counts, symmetric noise,
    // non-negative clamp), which is the part an engine can prove.
    // n_true stays in the projection because this IS the verification
    // harness — the release view drops it.
    "q_dp_noisy_counts" -> { (s, dir) =>
      Tables.load(s, dir, "customer")
        .groupBy(col("c_mktsegment").as("mktsegment"))
        .agg(count(lit(1)).as("n_true"))
        .withColumn("noise",
          bit_count(Dedup.shingleHash(
            concat(lit("dp:"), col("mktsegment")))).cast("long") - 30L)
        .withColumn("n_released",
          greatest(lit(0L), col("n_true") + col("noise")))
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
         |FROM bc GROUP BY 1, 2""".stripMargin,

    "q_t_closeness" ->
      s"""WITH rows0 AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
         |    c_mktsegment AS mktsegment,
         |    $SENSITIVE_BAND AS band
         |  FROM customer),
         |bn AS (SELECT nationkey, mktsegment, band, count(*) AS bn
         |  FROM rows0 GROUP BY 1, 2, 3),
         |cohorts AS (SELECT nationkey, mktsegment,
         |    CAST(sum(bn) AS BIGINT) AS cohort_n
         |  FROM bn GROUP BY 1, 2),
         |g AS (SELECT band, count(*) AS gn FROM rows0 GROUP BY 1),
         |tot AS (SELECT count(*) AS n_rows FROM rows0),
         |grid AS (SELECT c.nationkey, c.mktsegment, c.cohort_n,
         |    gl.band, gl.gn, coalesce(b.bn, 0) AS bn
         |  FROM cohorts c CROSS JOIN g gl
         |  LEFT JOIN bn b ON b.nationkey = c.nationkey
         |    AND b.mktsegment = c.mktsegment AND b.band = gl.band),
         |agg AS (SELECT nationkey, mktsegment,
         |    max(cohort_n) AS cohort_n,
         |    CAST(sum(abs(CAST(bn AS HUGEINT) * t.n_rows
         |        - CAST(gn AS HUGEINT) * cohort_n)) * 10000
         |      // (2 * CAST(max(cohort_n) AS HUGEINT) * max(t.n_rows))
         |      AS BIGINT) AS tvd_bp
         |  FROM grid, tot t GROUP BY 1, 2)
         |SELECT nationkey, mktsegment, cohort_n, tvd_bp,
         |  tvd_bp >= $T_CLOSE_BP AS is_far
         |FROM agg""".stripMargin,

    "q_dp_noisy_counts" -> {
      val h = Dedup.shingleHashSql("'dp:' || mktsegment")
      s"""WITH c AS (SELECT c_mktsegment AS mktsegment,
         |    count(*) AS n_true
         |  FROM customer GROUP BY 1),
         |n AS (SELECT mktsegment, CAST(n_true AS BIGINT) AS n_true,
         |    CAST(bit_count($h) AS BIGINT) - 30 AS noise
         |  FROM c)
         |SELECT mktsegment, n_true, noise,
         |  greatest(CAST(0 AS BIGINT), n_true + noise) AS n_released
         |FROM n""".stripMargin
    })
}
