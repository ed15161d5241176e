package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Score-calibration audits: is the quality score USABLE as a
  * probability, and can its error be given a distribution-free
  * guarantee?
  *
  * A curation pipeline doesn't just rank by a quality score — it sets
  * thresholds on it ("drop everything the model is <90 % sure about"),
  * and that arithmetic is only sound if the score is CALIBRATED. These
  * two queries are the audits that precede any threshold policy:
  *
  *   - q_calibration_ece: the reliability table (predicted confidence
  *     vs observed clean rate per score bin) plus the expected
  *     calibration error, against the same exact-dup ground truth
  *     q_quality_auc ranks against;
  *   - q_conformal_coverage: split conformal prediction (Vovk et al.;
  *     Angelopoulos & Bates '21 tutorial) — the finite-sample
  *     quantile rule whose coverage guarantee holds for ANY score,
  *     calibrated or not, verified empirically on the held-out split.
  *
  * Everything is integer arithmetic (permille/ppm, truncating division
  * on non-negative operands) so the DuckDB twins gate exact hashes.
  */
object Calibration {

  /** Conformal miscoverage target α = 1/ALPHA_INV (α = 0.1 ⇒ 90 %). */
  val ALPHA_INV = 10

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Per-doc (quality, is-exact-dup) — the shared ground-truth frame.
    * The fp-size attach is a fact-fact join keyed on the fingerprint
    * (NOT a broadcast: the dup-fingerprint table is corpus-sized at
    * 100 TB), the same shape as q_dup_aware_sample.
    */
  private def labeled(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("fp"),
      TextFunctions.qualityScore(col("text")).cast("long").as("q"))
    val sz = d.groupBy(col("fp")).agg(count(lit(1)).as("fsz"))
    d.join(sz, Seq("fp"))
      .withColumn("clean", when(col("fsz") === 1L, 1L).otherwise(0L))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── reliability table + expected calibration error ─────────────────
    // Read the quality score (0..100) as a claimed P(clean) and bin it
    // by tens: per bin, the mean claimed confidence (permille) vs the
    // observed exact-unique rate (permille), plus the corpus ECE —
    // ECE_pm = Σ_b |Σq·10 − n_clean·1000| div N, i.e. the n-weighted
    // mean |conf − acc| computed from UNtruncated per-bin sums so the
    // only truncation is the final division (truncate ≡ floor:
    // non-negative). The per-bin gaps are the actionable readout: a
    // threshold policy at bin b is off by gap_pm(b), not by ECE.
    //
    // Scale: one corpus-sized fp-keyed join + one bin-keyed aggregate
    // (≤ 11 bins); ECE attaches as a one-row broadcast.
    "q_calibration_ece" -> { (s, dir) =>
      val bins = labeled(s, dir)
        .withColumn("bin", expr("q div 10"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(col("q")).as("sum_q"),
          sum(col("clean")).as("n_clean"))
      val ece = bins.agg(
        expr("sum(abs(sum_q * 10 - n_clean * 1000)) div sum(n)")
          .as("ece_pm"))
      bins.crossJoin(broadcast(ece))
        .select(col("bin"), col("n"),
          expr("sum_q * 10 div n").as("conf_pm"),
          expr("n_clean * 1000 div n").as("clean_pm"),
          expr("abs(sum_q * 10 - n_clean * 1000) div n").as("gap_pm"),
          col("ece_pm"))
    },

    // ── split-conformal coverage of the quality score ──────────────────
    // Nonconformity = 1000 − q·10 (higher = worse). Threshold = the
    // ⌈(n_cal+1)(1−α)⌉-th smallest calibration score — the exact
    // finite-sample rule whose marginal coverage on exchangeable data
    // is ≥ 1−α regardless of the score's quality. The rank picks out
    // of the DISTINCT-score histogram via cumulative counts (the
    // q_quantiles bounded-window shape: ≤ 101 distinct values at any
    // corpus size); coverage is then measured on the test split. When
    // the rank exceeds n_cal (tiny calibration sets) the threshold is
    // +∞ by the conformal convention — emitted as NULL with full
    // coverage, CASE-guarded identically in both engines.
    "q_conformal_coverage" -> { (s, dir) =>
      val scored = docs(s, dir).select(
        Curation.splitLabel(col("doc_id")).as("split"),
        (lit(1000L) - TextFunctions.qualityScore(col("text"))
          .cast("long") * 10L).as("nc"))
      val calHist = scored.filter(col("split") === "valid")
        .groupBy(col("nc")).agg(count(lit(1)).as("c"))
      val nCal = calHist.agg(sum(col("c")).as("n_cal"))
      val wCum = Window.orderBy(col("nc"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val thr = calHist
        .withColumn("cum", sum(col("c")).over(wCum))
        .crossJoin(broadcast(nCal))
        // rank = ceil((n_cal+1)·(1−α)) = ((n_cal+1)·(ALPHA_INV−1)
        //        + ALPHA_INV−1) div ALPHA_INV
        .withColumn("rank", expr(
          s"((n_cal + 1) * ${ALPHA_INV - 1} + ${ALPHA_INV - 1})" +
            s" div $ALPHA_INV"))
        .agg(max(col("n_cal")).as("n_cal"), max(col("rank")).as("rank"),
          min(when(col("cum") >= col("rank"), col("nc")))
            .as("threshold"))
      scored.filter(col("split") === "test")
        .crossJoin(broadcast(thr))
        .agg(max(col("n_cal")).as("n_cal"),
          max(when(col("rank") <= col("n_cal"), col("threshold")))
            .as("threshold"),
          count(lit(1)).as("n_test"),
          sum(when(col("rank") > col("n_cal"), 1L)
            .when(col("nc") <= col("threshold"), 1L).otherwise(0L))
            .as("n_covered"))
        .withColumn("coverage_ppm",
          expr("n_covered * 1000000 div n_test"))
    },

    // ── Mondrian (group-conditional) conformal, per language ───────────
    // Marginal coverage can hide a language whose scores are
    // systematically worse — the guarantee a multilingual corpus owner
    // actually wants is PER-GROUP. Mondrian conformal runs the same
    // finite-sample quantile rule inside each language: per-lang
    // threshold from the lang's own calibration histogram (windows over
    // |langs| × |distinct scores| rows — bounded), per-lang coverage on
    // the test split. Small languages hit the rank > n_cal ⇒ +∞
    // convention naturally; the q_conformal_coverage CASE carries over
    // per group.
    //
    // Scale: one corpus-sized pass per split; thresholds are a
    // |langs|-row broadcast.
    "q_conformal_group" -> { (s, dir) =>
      val scored = docs(s, dir).select(col("lang"),
        Curation.splitLabel(col("doc_id")).as("split"),
        (lit(1000L) - TextFunctions.qualityScore(col("text"))
          .cast("long") * 10L).as("nc"))
      val calHist = scored.filter(col("split") === "valid")
        .groupBy(col("lang"), col("nc")).agg(count(lit(1)).as("c"))
      val nCal = calHist.groupBy(col("lang"))
        .agg(sum(col("c")).as("n_cal"))
      val wCum = Window.partitionBy(col("lang")).orderBy(col("nc"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val thr = calHist
        .withColumn("cum", sum(col("c")).over(wCum))
        .join(broadcast(nCal), Seq("lang"))
        .withColumn("rank", expr(
          s"((n_cal + 1) * ${ALPHA_INV - 1} + ${ALPHA_INV - 1})" +
            s" div $ALPHA_INV"))
        .groupBy(col("lang"))
        .agg(max(col("n_cal")).as("n_cal"), max(col("rank")).as("rank"),
          min(when(col("cum") >= col("rank"), col("nc")))
            .as("threshold"))
      scored.filter(col("split") === "test")
        .join(broadcast(thr), Seq("lang"))
        .groupBy(col("lang"))
        .agg(max(col("n_cal")).as("n_cal"),
          max(when(col("rank") <= col("n_cal"), col("threshold")))
            .as("threshold"),
          count(lit(1)).as("n_test"),
          sum(when(col("rank") > col("n_cal"), 1L)
            .when(col("nc") <= col("threshold"), 1L).otherwise(0L))
            .as("n_covered"))
        .withColumn("coverage_ppm",
          expr("n_covered * 1000000 div n_test"))
    })

  private def fpCte =
    """fpt AS (SELECT doc_id,
      |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      |  FROM documents),
      |fsz AS (SELECT fp, count(*) AS fsz FROM fpt GROUP BY 1)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_calibration_ece" ->
      s"""WITH ${TextQueries.qualityCtes},
         |$fpCte,
         |lab AS (SELECT CAST(qv.quality AS BIGINT) AS q,
         |    CASE WHEN z.fsz = 1 THEN 1 ELSE 0 END AS clean
         |  FROM qv JOIN fpt f ON f.doc_id = qv.doc_id
         |  JOIN fsz z ON z.fp = f.fp),
         |bins AS (SELECT q // 10 AS bin, count(*) AS n,
         |    sum(q) AS sum_q, sum(clean) AS n_clean
         |  FROM lab GROUP BY 1),
         |e AS (SELECT sum(abs(sum_q * 10 - n_clean * 1000)) // sum(n)
         |    AS ece_pm FROM bins)
         |SELECT bin, n,
         |  CAST(sum_q * 10 // n AS BIGINT) AS conf_pm,
         |  CAST(n_clean * 1000 // n AS BIGINT) AS clean_pm,
         |  CAST(abs(sum_q * 10 - n_clean * 1000) // n AS BIGINT) AS gap_pm,
         |  CAST(e.ece_pm AS BIGINT) AS ece_pm
         |FROM bins, e""".stripMargin,

    "q_conformal_coverage" ->
      s"""WITH ${TextQueries.qualityCtes},
         |sc AS (SELECT CASE
         |      WHEN ${Curation.bucketSqlFor("d.doc_id")} < 80 THEN 'train'
         |      WHEN ${Curation.bucketSqlFor("d.doc_id")} < 90 THEN 'valid'
         |      ELSE 'test' END AS split,
         |    1000 - CAST(qv.quality AS BIGINT) * 10 AS nc
         |  FROM documents d JOIN qv ON qv.doc_id = d.doc_id),
         |hist AS (SELECT nc, count(*) AS c FROM sc
         |  WHERE split = 'valid' GROUP BY 1),
         |cum AS (SELECT nc, sum(c) OVER (ORDER BY nc
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM hist),
         |n AS (SELECT CAST(sum(c) AS BIGINT) AS n_cal FROM hist),
         |t AS (SELECT n.n_cal,
         |    ((n.n_cal + 1) * ${ALPHA_INV - 1} + ${ALPHA_INV - 1})
         |      // $ALPHA_INV AS rank,
         |    min(CASE WHEN cum.cum >= ((n.n_cal + 1)
         |        * ${ALPHA_INV - 1} + ${ALPHA_INV - 1}) // $ALPHA_INV
         |      THEN cum.nc END) AS threshold
         |  FROM n, cum GROUP BY 1, 2)
         |SELECT t.n_cal,
         |  CASE WHEN t.rank <= t.n_cal THEN t.threshold END AS threshold,
         |  count(*) AS n_test,
         |  CAST(sum(CASE WHEN t.rank > t.n_cal THEN 1
         |           WHEN sc.nc <= t.threshold THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_covered,
         |  CAST(sum(CASE WHEN t.rank > t.n_cal THEN 1
         |           WHEN sc.nc <= t.threshold THEN 1 ELSE 0 END)
         |    * 1000000 // count(*) AS BIGINT) AS coverage_ppm
         |FROM sc, t WHERE sc.split = 'test'
         |GROUP BY t.n_cal, t.rank, t.threshold""".stripMargin,

    "q_conformal_group" ->
      s"""WITH ${TextQueries.qualityCtes},
         |sc AS (SELECT d.lang, CASE
         |      WHEN ${Curation.bucketSqlFor("d.doc_id")} < 80 THEN 'train'
         |      WHEN ${Curation.bucketSqlFor("d.doc_id")} < 90 THEN 'valid'
         |      ELSE 'test' END AS split,
         |    1000 - CAST(qv.quality AS BIGINT) * 10 AS nc
         |  FROM documents d JOIN qv ON qv.doc_id = d.doc_id),
         |hist AS (SELECT lang, nc, count(*) AS c FROM sc
         |  WHERE split = 'valid' GROUP BY 1, 2),
         |n AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_cal
         |  FROM hist GROUP BY 1),
         |cum AS (SELECT lang, nc, sum(c) OVER (PARTITION BY lang
         |    ORDER BY nc ROWS BETWEEN UNBOUNDED PRECEDING AND
         |    CURRENT ROW) AS cum
         |  FROM hist),
         |t AS (SELECT n.lang, n.n_cal,
         |    ((n.n_cal + 1) * ${ALPHA_INV - 1} + ${ALPHA_INV - 1})
         |      // $ALPHA_INV AS rank,
         |    min(CASE WHEN cum.cum >= ((n.n_cal + 1)
         |        * ${ALPHA_INV - 1} + ${ALPHA_INV - 1}) // $ALPHA_INV
         |      THEN cum.nc END) AS threshold
         |  FROM n JOIN cum ON cum.lang = n.lang GROUP BY 1, 2, 3)
         |SELECT sc.lang, t.n_cal,
         |  CASE WHEN t.rank <= t.n_cal THEN t.threshold END AS threshold,
         |  count(*) AS n_test,
         |  CAST(sum(CASE WHEN t.rank > t.n_cal THEN 1
         |           WHEN sc.nc <= t.threshold THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_covered,
         |  CAST(sum(CASE WHEN t.rank > t.n_cal THEN 1
         |           WHEN sc.nc <= t.threshold THEN 1 ELSE 0 END)
         |    * 1000000 // count(*) AS BIGINT) AS coverage_ppm
         |FROM sc JOIN t ON t.lang = sc.lang WHERE sc.split = 'test'
         |GROUP BY sc.lang, t.n_cal, t.rank, t.threshold""".stripMargin)
}
