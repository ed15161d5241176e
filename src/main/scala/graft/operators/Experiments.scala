package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Experiment-health and series-quality diagnostics: the checks run
  * BEFORE trusting an A/B readout or a metric series.
  *
  *   - q_ab_srm — sample-ratio mismatch: the assignment-health
  *     chi-square (Fabijan et al., "Diagnosing Sample Ratio Mismatch in
  *     Online Controlled Experiments", KDD'19). An experiment whose
  *     50/50 split drifts fails this BEFORE any metric is read;
  *     complements q_ab_conversion (the effect readout on the same
  *     hash-arm contract).
  *   - q_ewma_daily — exponentially-weighted smoothing of per-type daily
  *     event counts, the anomaly-baseline twin of q_seasonal_anomaly's
  *     same-slot z-score and q_cusum_changepoint's drift detector.
  *   - q_benford — first-significant-digit distribution of order totals
  *     vs Benford's law, the classic fabricated-/corrupted-feed audit
  *     (complements q_dq_checks' schema rules with a DISTRIBUTIONAL
  *     rule).
  *   - q_contingency_chi2 — χ² independence between two categorical
  *     dimensions (segment × priority) via the Σ O²·N/(row·col) − N
  *     identity (one floor-division per cell).
  *   - q_power_sample_size — required users per arm across an MDE grid,
  *     the design-phase twin of the SRM/conversion readouts.
  *
  * Determinism contract (hash gate): all statistics are integer /
  * DECIMAL(38,0) with divisions on non-negative operands only, so
  * Spark's `div` and DuckDB's `//` agree bit-for-bit at any scale.
  *
  * 100 TB posture: q_ab_srm is one user-keyed aggregate folded to a
  * single row; q_ewma_daily windows over the (type, day) AGGREGATE
  * (bounded by types × days, not events) with a 10-term lag comb;
  * q_benford is one 9-group aggregate against a broadcast constant
  * table.
  */
object Experiments {

  /** Arm-assignment hash seed (its own stream; independent of
    * q_ab_conversion's AB_SEED so the two health checks don't share a
    * split).
    */
  private val SRM_SEED = 29

  /** χ²(df=1) milli-threshold at p=0.05. */
  private val CHI2_MILLI_95 = 3841L

  /** q_autocorr: largest lag (days) in the ACF readout — covers the
    * weekly cycle with one spare.
    */
  private val ACF_MAX_LAG = 7

  /** q_ols_multi: sample seed + the hard cap the DECIMAL(38,0)
    * headroom proof assumes (see the query comment).
    */
  private val OLS_SEED = 59
  private val OLS_MAX_N = 10000

  /** q_permutation_test: permutation count and hash seed (own stream;
    * b = 0 is the observed split, 1..B the null).
    */
  private val PERM_B = 32
  private val PERM_SEED = 67

  /** q_bootstrap_ci: replicate count, hash seed, and the Poisson(1)
    * inverse-CDF (cumulative ppm; tail clamped at 5 — P(X≥5) ≈ 0.37 %).
    */
  private val BOOT_B = 32
  private val BOOT_SEED = 61
  private val POISSON_W_SQL =
    """CASE WHEN u < 367879 THEN 0 WHEN u < 735758 THEN 1
      |     WHEN u < 919698 THEN 2 WHEN u < 981011 THEN 3
      |     WHEN u < 996339 THEN 4 ELSE 5 END""".stripMargin

  /** Cramer determinants over the q_ols_multi sum names — shared
    * verbatim by the Spark selectExpr (DECIMAL(38,0) sums) and the
    * DuckDB oracle (HUGEINT sums): (det M, det M₀, det M₁, det M₂)
    * for M·β = r, M = [[n,Σx₁,Σx₂],[Σx₁,Σx₁²,Σx₁x₂],[Σx₂,Σx₁x₂,Σx₂²]],
    * r = [Σy, Σx₁y, Σx₂y].
    */
  private def olsDets: (String, String, String, String) = (
    "(cnt*(sx11*sx22 - sx12*sx12) - sx1*(sx1*sx22 - sx12*sx2)" +
      " + sx2*(sx1*sx12 - sx11*sx2))",
    "(sy*(sx11*sx22 - sx12*sx12) - sx1*(sx1y*sx22 - sx12*sx2y)" +
      " + sx2*(sx1y*sx12 - sx11*sx2y))",
    "(cnt*(sx1y*sx22 - sx12*sx2y) - sy*(sx1*sx22 - sx12*sx2)" +
      " + sx2*(sx1*sx2y - sx1y*sx2))",
    "(cnt*(sx11*sx2y - sx1y*sx12) - sx1*(sx1*sx2y - sx1y*sx2)" +
      " + sy*(sx1*sx12 - sx11*sx2))")

  /** EWMA comb length (present-day ROWS window) and halving weights:
    * weight of the k-th most recent present day is 2^(COMB-1-k).
    */
  private val COMB = 10

  /** q_power_sample_size MDE grid (bp) and the two-proportion power
    * constant (z₀.₀₂₅ + z₀.₈)² = (1.96 + 0.84)² = 7.84, carried as
    * 784/100 so the whole formula stays integral.
    */
  private val MDE_BP = Seq(50L, 100L, 200L, 400L)
  private val POWER_K_CENTI = 784L

  /** Benford expected first-digit shares, ppm: ⌊10⁶·log10(1+1/d)⌋.
    * Shared literal constants in BOTH engines — never recomputed in
    * floating point at query time.
    */
  private val BENFORD_PPM: Seq[(String, Long)] = Seq(
    "1" -> 301029L, "2" -> 176091L, "3" -> 124938L, "4" -> 96910L,
    "5" -> 79181L, "6" -> 66946L, "7" -> 57991L, "8" -> 51152L,
    "9" -> 45757L)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── sample-ratio mismatch χ² on the hash-assigned 50/50 split ──────
    // χ² for a two-cell uniform expectation collapses to (n_a−n_b)²/N;
    // milli-units keep it integral. The square runs in DECIMAL(38,0):
    // the gap is N-bounded, so int64 would wrap past ~3·10⁹ users.
    "q_ab_srm" -> { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("user_id")).distinct()
        .withColumn("arm",
          Dedup.hash32(SRM_SEED, col("user_id").cast("string")) % 2)
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
        .withColumn("chi2_milli", expr(
          "CASE WHEN n_a + n_b = 0 THEN CAST(NULL AS BIGINT)" +
            " ELSE CAST(CAST(n_a - n_b AS DECIMAL(38,0)) * (n_a - n_b)" +
            " * 1000 div (n_a + n_b) AS BIGINT) END"))
        .withColumn("srm_detected", col("chi2_milli") >= CHI2_MILLI_95)
    },

    // ── EWMA of daily event counts per type (halving weights) ──────────
    // The series is the (type, day) count aggregate; smoothing is a
    // 10-term lag comb over PRESENT days: num = Σ 2^(9−k)·n_{t−k},
    // den = Σ 2^(9−k) over available lags (ramp-up days renormalize
    // instead of reading a zero-filled cold start). den ≥ 2^9 always
    // (the k=0 term is the row itself), so the division never sees 0.
    "q_ewma_daily" -> { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      val daily = e.select(col("event_type"),
          Tables.epochMs(e).as("ms"))
        .selectExpr("event_type", "ms div 86400000 AS day_idx")
        .groupBy(col("event_type"), col("day_idx"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day_idx"))
      val num = (0 until COMB).map { k =>
        coalesce(lag(col("n"), k).over(w), lit(0L)) *
          lit(1L << (COMB - 1 - k))
      }.reduce(_ + _)
      val den = (0 until COMB).map { k =>
        when(lag(col("n"), k).over(w).isNotNull,
          lit(1L << (COMB - 1 - k))).otherwise(lit(0L))
      }.reduce(_ + _)
      daily.withColumn("num", num).withColumn("den", den)
        .selectExpr("event_type", "day_idx", "n",
          "num * 1000 div den AS ewma_milli")
    },

    // ── χ² independence: market segment × order priority ───────────────
    // The categorical-association audit (are two labeling dimensions
    // independent?) via the identity Σ(O−E)²/E = Σ O²·N/(row·col) − N,
    // which needs ONE floor-division per cell: chi2_milli =
    // Σ ⌊O²·N·10³/(row_n·col_n)⌋ − 10³·N, exact in DECIMAL(38,0) /
    // HUGEINT while N³·10³ < 10³⁸ (N ≲ 4·10¹¹ joined rows — beyond
    // that, pre-aggregate or sample upstream; the gate would surface
    // the overflow as a NULL split, not silent drift).
    "q_contingency_chi2" -> { (s, dir) =>
      val j = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          col("o_orderpriority").as("pri"))
      val cells = j.groupBy(col("seg"), col("pri"))
        .agg(count(lit(1)).as("o"))
      val rows = cells.groupBy(col("seg")).agg(sum(col("o")).as("row_n"))
      val cols = cells.groupBy(col("pri")).agg(sum(col("o")).as("col_n"))
      val dims = cells.agg(countDistinct(col("seg")).as("r"),
        countDistinct(col("pri")).as("c"), sum(col("o")).as("n"))
      cells.join(rows, Seq("seg")).join(cols, Seq("pri"))
        .crossJoin(broadcast(dims))
        .agg(max(col("n")).as("n"), max(col("r")).as("r"),
          max(col("c")).as("c"),
          sum(expr("CAST(CAST(o AS DECIMAL(38,0)) * o * n * 1000" +
            " div (CAST(row_n AS DECIMAL(38,0)) * col_n)" +
            " AS DECIMAL(38,0))")).as("terms"))
        .selectExpr("n", "(r - 1) * (c - 1) AS dof",
          "CAST(terms - CAST(n AS DECIMAL(38,0)) * 1000 AS BIGINT)" +
            " AS chi2_milli")
    },

    // ── required sample size per arm across an MDE grid ────────────────
    // Experiment DESIGN twin of q_ab_srm/q_ab_conversion: from the
    // observed base conversion p (bp), the classic two-proportion
    // approximation n = 2(z_{α/2}+z_β)²·p(1−p)/δ² on an MDE grid —
    // all integer: n = ⌊2·784·p_bp·(10⁴−p_bp) / (100·mde_bp²)⌋.
    "q_power_sample_size" -> { (s, dir) =>
      import s.implicits._
      val conv = Tables.load(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("converted"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("converted")).as("n_conv"))
        .selectExpr("CASE WHEN n_users = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE n_conv * 10000 div n_users END AS p_bp")
      broadcast(MDE_BP.toDF("mde_bp")).crossJoin(broadcast(conv))
        .selectExpr("mde_bp", "p_bp",
          "CASE WHEN p_bp IS NULL THEN CAST(NULL AS BIGINT)" +
            s" ELSE CAST(2 * $POWER_K_CENTI" +
            " * CAST(p_bp AS DECIMAL(38,0)) * (10000 - p_bp)" +
            " div (100 * mde_bp * mde_bp) AS BIGINT) END AS n_per_arm")
    },

    // ── Poisson-bootstrap confidence interval, hash-deterministic ──────
    // The uncertainty readout the point estimates lack: B = 32
    // bootstrap replicates of mean order value, each row's multiplicity
    // in replicate b drawn Poisson(1) — by inverse-CDF over a LITERAL
    // integer table (CDF in ppm: P(0)=.3679, …, tail clamped at 5) on
    // the (row, b) hash, so the whole resample is a pure function of
    // the data (engine-identical, no RNG; Poisson bootstrap is the
    // streaming-friendly bootstrap — Chamandy et al., "Estimating
    // Uncertainty for Massive Data Streams", Google TR'12). Replicate
    // means in integer cents (truncating div); the CI bounds are the
    // 2nd and 31st order statistics of the 32 means — a bounded fold,
    // no quantile machinery.
    //
    // 100 TB posture: one row-keyed projection fans each row to its
    // ≤ B nonzero-weight replicates (expected B rows out per row in),
    // then a 32-group aggregate; the order-statistic pick runs on a
    // 32-row table.
    "q_bootstrap_ci" -> { (s, dir) =>
      val reps = s.range(0, BOOT_B).select(col("id").as("b"))
      // ONE md5 per row, then B affine sub-streams mod P (the MinHash
      // one-base-hash trick) — hashing 33× per row was the measured
      // 10 s hot spot; per-b coefficients ride broadcast array literals
      val aArr = array((0 until BOOT_B).map(i =>
        lit(Dedup.affineA(i))): _*)
      val bArr = array((0 until BOOT_B).map(i =>
        lit(Dedup.affineB(i))): _*)
      val rows = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("cents"))
        .withColumn("h", Dedup.hash32(BOOT_SEED,
          col("o_orderkey").cast("string")) % Dedup.P)
        .crossJoin(broadcast(reps))
        .withColumn("u",
          (element_at(aArr, (col("b") + 1).cast("int")) * col("h") +
            element_at(bArr, (col("b") + 1).cast("int")))
            % Dedup.P % 1000000)
        .withColumn("w", expr(POISSON_W_SQL))
        .filter(col("w") > 0)
      val means = rows.groupBy(col("b"))
        .agg(expr("CAST(sum(CAST(w AS DECIMAL(38,0)) * cents)" +
          " div sum(w) AS BIGINT)").as("mean_cents"))
      means.agg(count(lit(1)).as("n_replicates"),
          min(col("mean_cents")).as("mn"), max(col("mean_cents")).as("mx"),
          sort_array(collect_list(col("mean_cents"))).as("ms"))
        .select(col("n_replicates"),
          expr(s"get(ms, 1)").as("ci_lo_cents"),
          expr(s"get(ms, ${BOOT_B - 2})").as("ci_hi_cents"),
          col("mn").as("min_cents"), col("mx").as("max_cents"))
    },

    // ── hash-deterministic permutation test (A/A readout) ──────────────
    // The significance machinery beside q_bootstrap_ci's CI: user-level
    // ACTIVITY (events per user — the fixture's conversion flag is
    // degenerate: every synthetic user purchases) split into two arms
    // B+1 independent ways by the (b, user) hash; b = 0 is the
    // "observed" split, b = 1..B the permutation null. p_milli =
    // (1 + #{b ≥ 1 : |diff_b| ≥ |diff_0|}) ·10³ div (B+1) — the
    // standard permutation p with the +1 guard.
    // Every split is a hash re-labeling of the SAME users, so this is
    // an A/A test: a small p here means the arm-assignment machinery
    // itself is broken (the q_ab_srm complement at the outcome level).
    // All arithmetic integer ppm (truncating div on non-negatives).
    //
    // 100 TB posture: one user-keyed conversion aggregate, then a
    // (B+1)-way broadcast fan-out map-side combined onto 2(B+1)
    // groups; the decision runs on a (B+1)-row table.
    "q_permutation_test" -> { (s, dir) =>
      val users = Tables.load(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("conv"))
      val reps = s.range(0, PERM_B + 1).select(col("id").as("b"))
      val arms = users.crossJoin(broadcast(reps))
        .withColumn("arm", Dedup.hash32(PERM_SEED,
          concat_ws("|", col("b"), col("user_id"))) % 2)
        .groupBy(col("b"), col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("k"))
      val diffs = arms.groupBy(col("b"))
        .agg(expr("abs(max(CASE WHEN arm = 0 THEN k * 1000000 div n END)" +
          " - max(CASE WHEN arm = 1 THEN k * 1000000 div n END))")
          .as("diff_ppm"))
      val obs = diffs.filter(col("b") === 0)
        .select(col("diff_ppm").as("obs_ppm"))
      diffs.filter(col("b") > 0).crossJoin(broadcast(obs))
        .agg(max(col("obs_ppm")).as("observed_diff_ppm"),
          sum(when(col("diff_ppm") >= col("obs_ppm"), 1L).otherwise(0L))
            .as("n_ge"))
        .select(col("observed_diff_ppm"), col("n_ge"),
          expr(s"(1 + n_ge) * 1000 div ${PERM_B + 1}").as("p_milli"))
    },

    // ── two-feature OLS via exact-integer normal equations ─────────────
    // Multiple regression extending q_ols_trend's single slope:
    // extendedprice cents ~ b0 + b1·quantity + b2·retail_cents, solved
    // in closed form by Cramer's rule on the 3×3 normal matrix — every
    // determinant is an exact DECIMAL(38,0)/HUGEINT polynomial of the
    // nine sample sums, so both engines agree bit-for-bit (betas in
    // milli; sign handled by branch, never by negative floor division).
    // Sample is hash-bottom-k BOUNDED at OLS_MAX_N like q_correlation:
    // with n ≤ 10⁴, qty ≤ 10², cents ≤ 10⁷ every determinant·10³ stays
    // ≤ ~10³⁵ < 10³⁸ (guard raises past the proven cap).
    //
    // 100 TB posture: deterministic bottom-k sample (TakeOrdered, no
    // global sort materialization) + broadcast part-dim join + one
    // 9-sum aggregate folded to a single row.
    "q_ols_multi" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .filter(Dedup.hash32(OLS_SEED,
          concat_ws("|", col("l_orderkey"), col("l_linenumber")))
          % 100 === 0)
        .withColumn("hk", Dedup.hash32(OLS_SEED + 1,
          concat_ws("|", col("l_orderkey"), col("l_linenumber"))))
        .orderBy(col("hk").asc, col("l_orderkey").asc,
          col("l_linenumber").asc)
        .limit(OLS_MAX_N)
      val p = Tables.load(s, dir, "part")
        .select(col("p_partkey"),
          expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)")
            .as("x2"))
      val rows = li.join(broadcast(p),
          li("l_partkey") === p("p_partkey"))
        .select(expr("CAST(floor(l_quantity) AS BIGINT)").as("x1"),
          col("x2"),
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
            .as("y"))
      val sums = rows.agg(count(lit(1)).as("cnt"),
        sum("x1").as("sx1"), sum("x2").as("sx2"), sum("y").as("sy"),
        sum(expr("x1*x1")).as("sx11"), sum(expr("x1*x2")).as("sx12"),
        sum(expr("x2*x2")).as("sx22"),
        sum(expr("x1*y")).as("sx1y"), sum(expr("x2*y")).as("sx2y"))
        .selectExpr(Seq(
          s"""CASE WHEN cnt <= $OLS_MAX_N THEN cnt ELSE raise_error(
             |  'q_ols_multi: sample exceeds the proven DECIMAL(38,0)
             | headroom bound ($OLS_MAX_N rows) - lower the sample
             | fraction') END AS cnt""".stripMargin) ++
          Seq("sx1", "sx2", "sy", "sx11", "sx12", "sx22", "sx1y",
            "sx2y").map(c => s"CAST($c AS DECIMAL(38,0)) AS $c"): _*)
      val (det, d0, d1, d2) = olsDets
      def beta(dj: String, nm: String) =
        s"""CASE WHEN $det = 0 THEN CAST(NULL AS BIGINT)
           |  WHEN ($dj >= 0) = ($det >= 0)
           |    THEN CAST(abs($dj) * 1000 div abs($det) AS BIGINT)
           |  ELSE -CAST(abs($dj) * 1000 div abs($det) AS BIGINT)
           |END AS $nm""".stripMargin
      sums.selectExpr("CAST(cnt AS BIGINT) AS n",
        beta(d0, "b0_milli"), beta(d1, "b1_milli"), beta(d2, "b2_milli"))
    },

    // ── lag-1..7 autocorrelation of the daily order series ─────────────
    // The seasonality detector behind q_seasonal_anomaly's fixed weekly
    // slot assumption: ACF at lag 7 ≫ other lags confirms the week
    // cycle from the data instead of assuming it. Exact-integer Pearson
    // per lag over day pairs (both days observed), reported as the
    // q_correlation convention: sign + r² in ppm (no sqrt). Counts are
    // first quantized to ≤ 3 digits (x = c div scale, scale from the
    // series max) — ACF is scale-invariant, and the quantization BOUNDS
    // the DECIMAL(38,0)/HUGEINT headroom by construction (X ≤ 10³,
    // days ≤ 10⁴ ⇒ num²·10⁶ ≤ 10³⁴ < 10³⁸) with no sample cap at any
    // corpus size.
    //
    // 100 TB posture: one map-combined day aggregate; everything after
    // runs on the |days|-row table (7 broadcast-joined lag copies).
    "q_autocorr" -> { (s, dir) =>
      val daily = Tables.load(s, dir, "orders")
        .select(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
      val sc = daily.agg(expr("(max(c) + 999) div 1000").as("scale"))
      val x = daily.crossJoin(broadcast(sc))
        .select(col("day"), expr("c div scale").as("x"))
      val ks = s.range(1, ACF_MAX_LAG + 1).select(col("id").as("k"))
      val pairs = x.crossJoin(broadcast(ks))
        .select(col("k"), (col("day") + col("k")).as("jday"), col("x"))
        .join(x.select(col("day").as("jday"), col("x").as("y")),
          Seq("jday"))
      pairs.groupBy(col("k")).agg(count(lit(1)).as("cnt"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(expr("x*y")).as("sxy"), sum(expr("x*x")).as("sxx"),
          sum(expr("y*y")).as("syy"))
        .selectExpr("k", "cnt AS n_pairs",
          """CASE WHEN CAST(cnt AS DECIMAL(38,0))*sxy
            |       - CAST(sx AS DECIMAL(38,0))*sy > 0 THEN CAST(1 AS BIGINT)
            |     WHEN CAST(cnt AS DECIMAL(38,0))*sxy
            |       - CAST(sx AS DECIMAL(38,0))*sy < 0 THEN CAST(-1 AS BIGINT)
            |     ELSE CAST(0 AS BIGINT) END AS r_sign""".stripMargin,
          """CASE WHEN (CAST(cnt AS DECIMAL(38,0))*sxx
            |           - CAST(sx AS DECIMAL(38,0))*sx)
            |         * (CAST(cnt AS DECIMAL(38,0))*syy
            |           - CAST(sy AS DECIMAL(38,0))*sy) = 0
            |  THEN CAST(NULL AS BIGINT)
            |  ELSE CAST((CAST(cnt AS DECIMAL(38,0))*sxy
            |         - CAST(sx AS DECIMAL(38,0))*sy)
            |       * (CAST(cnt AS DECIMAL(38,0))*sxy
            |         - CAST(sx AS DECIMAL(38,0))*sy) * 1000000
            |    div ((CAST(cnt AS DECIMAL(38,0))*sxx
            |           - CAST(sx AS DECIMAL(38,0))*sx)
            |         * (CAST(cnt AS DECIMAL(38,0))*syy
            |           - CAST(sy AS DECIMAL(38,0))*sy)) AS BIGINT)
            |  END AS r2_ppm""".stripMargin)
    },

    // ── per-type feed freshness lag vs the corpus head ─────────────────
    // The staleness monitor a multi-feed ingest needs: how far behind
    // the freshest feed is each type's latest event, with a 24 h stale
    // flag. One 5-row aggregate + a broadcast 1-row max attach.
    "q_freshness_lag" -> { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      val perType = e.select(col("event_type"), Tables.epochMs(e).as("ms"))
        .groupBy(col("event_type")).agg(max(col("ms")).as("last_ms"))
      val head = perType.agg(max(col("last_ms")).as("head_ms"))
      perType.crossJoin(broadcast(head))
        .select(col("event_type"), col("last_ms"),
          (col("head_ms") - col("last_ms")).as("lag_ms"),
          (col("head_ms") - col("last_ms") > 86400000L).as("is_stale"))
    },

    // ── Benford first-digit audit of order totals ──────────────────────
    // All 9 digits always report (expected side drives; zero-fill), so
    // a feed that never produces a digit is visible, not absent.
    "q_benford" -> { (s, dir) =>
      import s.implicits._
      val expected = BENFORD_PPM.toDF("digit", "exp_ppm")
      val obs = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") >= 1)
        .select(substring(floor(col("o_totalprice")).cast("long")
          .cast("string"), 1, 1).as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      val tot = obs.agg(sum(col("n_obs")).as("n_total"))
      broadcast(expected).join(obs, Seq("digit"), "left")
        .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
        .crossJoin(broadcast(tot))
        .selectExpr("digit", "n_obs",
          "CASE WHEN n_total = 0 THEN CAST(NULL AS BIGINT)" +
            " ELSE CAST(CAST(n_obs AS DECIMAL(38,0)) * 1000000" +
            " div n_total AS BIGINT) END AS obs_ppm",
          "exp_ppm")
        .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
    })

  val oracle: Map[String, String] = Map(

    "q_ab_srm" -> {
      val arm = graft.operators.Dedup
        .hash32Sql(SRM_SEED, "CAST(user_id AS VARCHAR)")
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |arms AS (SELECT ($arm) % 2 AS arm FROM u),
         |c AS (SELECT
         |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_a,
         |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_b
         |  FROM arms)
         |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         |  CASE WHEN n_a + n_b = 0 THEN CAST(NULL AS BIGINT)
         |    ELSE CAST(CAST(n_a - n_b AS HUGEINT) * (n_a - n_b) * 1000
         |      // (n_a + n_b) AS BIGINT) END AS chi2_milli,
         |  CASE WHEN n_a + n_b = 0 THEN NULL
         |    ELSE CAST(CAST(n_a - n_b AS HUGEINT) * (n_a - n_b) * 1000
         |      // (n_a + n_b) AS BIGINT) >= $CHI2_MILLI_95
         |  END AS srm_detected
         |FROM c""".stripMargin
    },

    "q_ewma_daily" -> {
      val numTerms = (0 until COMB).map { k =>
        s"coalesce(lag(n, $k) OVER w, 0) * ${1L << (COMB - 1 - k)}"
      }.mkString(" + ")
      val denTerms = (0 until COMB).map { k =>
        s"CASE WHEN lag(n, $k) OVER w IS NOT NULL" +
          s" THEN ${1L << (COMB - 1 - k)} ELSE 0 END"
      }.mkString(" + ")
      s"""WITH daily AS (
         |  SELECT event_type, epoch_ms(ts) // 86400000 AS day_idx,
         |    count(*) AS n
         |  FROM events GROUP BY 1, 2),
         |sm AS (SELECT event_type, day_idx, n,
         |    $numTerms AS num,
         |    $denTerms AS den
         |  FROM daily
         |  WINDOW w AS (PARTITION BY event_type ORDER BY day_idx ASC))
         |SELECT event_type, day_idx, n,
         |  CAST(num * 1000 // den AS BIGINT) AS ewma_milli
         |FROM sm""".stripMargin
    },

    "q_contingency_chi2" ->
      """WITH j AS (SELECT c_mktsegment AS seg, o_orderpriority AS pri
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |cells AS (SELECT seg, pri, count(*) AS o FROM j GROUP BY 1, 2),
        |rw AS (SELECT seg, sum(o) AS row_n FROM cells GROUP BY 1),
        |cl AS (SELECT pri, sum(o) AS col_n FROM cells GROUP BY 1),
        |dims AS (SELECT count(DISTINCT seg) AS r,
        |    count(DISTINCT pri) AS c, sum(o) AS n FROM cells)
        |SELECT CAST(d.n AS BIGINT) AS n,
        |  CAST((d.r - 1) * (d.c - 1) AS BIGINT) AS dof,
        |  CAST(sum(CAST(o AS HUGEINT) * o * d.n * 1000
        |      // (CAST(row_n AS HUGEINT) * col_n))
        |    - CAST(d.n AS HUGEINT) * 1000 AS BIGINT) AS chi2_milli
        |FROM cells JOIN rw USING (seg) JOIN cl USING (pri), dims d
        |GROUP BY d.n, d.r, d.c""".stripMargin,

    "q_power_sample_size" -> {
      val vals = MDE_BP.map(m => s"(CAST($m AS BIGINT))").mkString(", ")
      s"""WITH conv AS (SELECT user_id,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS converted
         |  FROM events GROUP BY 1),
         |p AS (SELECT CASE WHEN count(*) = 0 THEN CAST(NULL AS BIGINT)
         |    ELSE CAST(sum(converted) * 10000 // count(*) AS BIGINT)
         |  END AS p_bp FROM conv),
         |mde(mde_bp) AS (VALUES $vals)
         |SELECT mde_bp, p_bp,
         |  CASE WHEN p_bp IS NULL THEN CAST(NULL AS BIGINT)
         |    ELSE CAST(2 * $POWER_K_CENTI * CAST(p_bp AS HUGEINT)
         |      * (10000 - p_bp) // (100 * mde_bp * mde_bp) AS BIGINT)
         |  END AS n_per_arm
         |FROM mde, p""".stripMargin
    },

    "q_permutation_test" -> {
      val arm = Dedup.hash32Sql(PERM_SEED, "concat_ws('|', b, user_id)")
      s"""WITH users AS (SELECT user_id,
         |    count(*) AS conv
         |  FROM events GROUP BY 1),
         |reps AS (SELECT unnest(range(0, ${PERM_B + 1})) AS b),
         |arms AS (SELECT b, ($arm) % 2 AS arm, count(*) AS n,
         |    sum(conv) AS k
         |  FROM users CROSS JOIN reps GROUP BY 1, 2),
         |diffs AS (SELECT b,
         |    abs(max(CASE WHEN arm = 0 THEN k * 1000000 // n END)
         |      - max(CASE WHEN arm = 1 THEN k * 1000000 // n END))
         |      AS diff_ppm
         |  FROM arms GROUP BY 1),
         |obs AS (SELECT diff_ppm AS obs_ppm FROM diffs WHERE b = 0)
         |SELECT CAST(max(obs_ppm) AS BIGINT) AS observed_diff_ppm,
         |  CAST(sum(CASE WHEN diff_ppm >= obs_ppm THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_ge,
         |  CAST((1 + sum(CASE WHEN diff_ppm >= obs_ppm THEN 1 ELSE 0 END))
         |    * 1000 // ${PERM_B + 1} AS BIGINT) AS p_milli
         |FROM diffs, obs WHERE b > 0""".stripMargin
    },

    "q_bootstrap_ci" -> {
      val h = Dedup.hash32Sql(BOOT_SEED, "CAST(o_orderkey AS VARCHAR)")
      val as = (0 until BOOT_B).map(Dedup.affineA).mkString(", ")
      val bs = (0 until BOOT_B).map(Dedup.affineB).mkString(", ")
      s"""WITH reps AS (SELECT unnest(range(0, $BOOT_B)) AS b),
         |base AS (SELECT
         |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         |    ($h) % ${Dedup.P} AS h
         |  FROM orders),
         |fan AS (SELECT b, cents,
         |    (([$as])[CAST(b + 1 AS INT)] * h
         |      + ([$bs])[CAST(b + 1 AS INT)])
         |      % ${Dedup.P} % 1000000 AS u
         |  FROM base CROSS JOIN reps),
         |wtd AS (SELECT b, cents, $POISSON_W_SQL AS w FROM fan),
         |means AS (SELECT b,
         |    CAST(sum(CAST(w AS HUGEINT) * cents) // sum(w) AS BIGINT)
         |      AS mean_cents
         |  FROM wtd WHERE w > 0 GROUP BY 1),
         |s AS (SELECT count(*) AS n_replicates,
         |    min(mean_cents) AS mn, max(mean_cents) AS mx,
         |    list_sort(list(mean_cents)) AS ms
         |  FROM means)
         |SELECT CAST(n_replicates AS BIGINT) AS n_replicates,
         |  ms[2] AS ci_lo_cents, ms[${BOOT_B - 1}] AS ci_hi_cents,
         |  mn AS min_cents, mx AS max_cents
         |FROM s""".stripMargin
    },

    "q_ols_multi" -> {
      val (det, d0, d1, d2) = olsDets
      def beta(dj: String, nm: String) =
        s"""CASE WHEN $det = 0 THEN CAST(NULL AS BIGINT)
           |  WHEN ($dj >= 0) = ($det >= 0)
           |    THEN CAST(abs($dj) * 1000 // abs($det) AS BIGINT)
           |  ELSE -CAST(abs($dj) * 1000 // abs($det) AS BIGINT)
           |END AS $nm""".stripMargin
      s"""WITH li0 AS (SELECT l_partkey, l_quantity, l_extendedprice,
         |    ${Dedup.hash32Sql(OLS_SEED + 1,
               "concat_ws('|', l_orderkey, l_linenumber)")} AS hk,
         |    l_orderkey, l_linenumber
         |  FROM lineitem
         |  WHERE ${Dedup.hash32Sql(OLS_SEED,
               "concat_ws('|', l_orderkey, l_linenumber)")} % 100 = 0),
         |samp AS (SELECT l_partkey, l_quantity, l_extendedprice FROM li0
         |  ORDER BY hk, l_orderkey, l_linenumber LIMIT $OLS_MAX_N),
         |rows0 AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS x1,
         |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS x2,
         |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
         |  FROM samp JOIN part ON samp.l_partkey = part.p_partkey),
         |s0 AS (SELECT count(*) AS cnt, sum(x1) AS sx1, sum(x2) AS sx2,
         |    sum(y) AS sy, sum(x1*x1) AS sx11, sum(x1*x2) AS sx12,
         |    sum(x2*x2) AS sx22, sum(x1*y) AS sx1y, sum(x2*y) AS sx2y
         |  FROM rows0),
         |s AS (SELECT CAST(cnt AS HUGEINT) AS cnt,
         |    CAST(sx1 AS HUGEINT) AS sx1, CAST(sx2 AS HUGEINT) AS sx2,
         |    CAST(sy AS HUGEINT) AS sy, CAST(sx11 AS HUGEINT) AS sx11,
         |    CAST(sx12 AS HUGEINT) AS sx12, CAST(sx22 AS HUGEINT) AS sx22,
         |    CAST(sx1y AS HUGEINT) AS sx1y, CAST(sx2y AS HUGEINT) AS sx2y
         |  FROM s0)
         |SELECT CAST(cnt AS BIGINT) AS n,
         |  ${beta(d0, "b0_milli")},
         |  ${beta(d1, "b1_milli")},
         |  ${beta(d2, "b2_milli")}
         |FROM s""".stripMargin
    },

    "q_autocorr" ->
      s"""WITH daily AS (SELECT date_diff('day', DATE '1970-01-01',
         |      o_orderdate) AS day, count(*) AS c
         |    FROM orders GROUP BY 1),
         |sc AS (SELECT (max(c) + 999) // 1000 AS scale FROM daily),
         |x AS (SELECT CAST(day AS BIGINT) AS day, c // scale AS x
         |  FROM daily, sc),
         |ks AS (SELECT unnest(range(1, ${ACF_MAX_LAG + 1})) AS k),
         |p AS (SELECT ks.k, a.x AS x, b.x AS y
         |  FROM x a CROSS JOIN ks JOIN x b ON b.day = a.day + ks.k),
         |sums AS (SELECT k, count(*) AS cnt,
         |    sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
         |    sum(x*x) AS sxx, sum(y*y) AS syy
         |  FROM p GROUP BY 1),
         |d AS (SELECT k, cnt, sx, sy,
         |    CAST(cnt AS HUGEINT)*sxy - CAST(sx AS HUGEINT)*sy AS num,
         |    CAST(cnt AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx AS dxx,
         |    CAST(cnt AS HUGEINT)*syy - CAST(sy AS HUGEINT)*sy AS dyy
         |  FROM sums)
         |SELECT k, CAST(cnt AS BIGINT) AS n_pairs,
         |  CASE WHEN num > 0 THEN CAST(1 AS BIGINT)
         |       WHEN num < 0 THEN CAST(-1 AS BIGINT)
         |       ELSE CAST(0 AS BIGINT) END AS r_sign,
         |  CASE WHEN dxx * dyy = 0 THEN CAST(NULL AS BIGINT)
         |       ELSE CAST(num * num * 1000000 // (dxx * dyy) AS BIGINT)
         |  END AS r2_ppm
         |FROM d""".stripMargin,

    "q_freshness_lag" ->
      """WITH pt AS (SELECT event_type, max(epoch_ms(ts)) AS last_ms
        |  FROM events GROUP BY 1),
        |h AS (SELECT max(last_ms) AS head_ms FROM pt)
        |SELECT pt.event_type, pt.last_ms,
        |  h.head_ms - pt.last_ms AS lag_ms,
        |  h.head_ms - pt.last_ms > 86400000 AS is_stale
        |FROM pt, h""".stripMargin,

    "q_benford" -> {
      val vals = BENFORD_PPM
        .map { case (d, p) => s"('$d', CAST($p AS BIGINT))" }
        .mkString(", ")
      s"""WITH expected(digit, exp_ppm) AS (VALUES $vals),
         |obs AS (SELECT
         |    substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
         |      1, 1) AS digit,
         |    count(*) AS n_obs
         |  FROM orders WHERE o_totalprice >= 1 GROUP BY 1),
         |tot AS (SELECT sum(n_obs) AS n_total FROM obs)
         |SELECT e.digit, CAST(coalesce(o.n_obs, 0) AS BIGINT) AS n_obs,
         |  CASE WHEN t.n_total = 0 THEN CAST(NULL AS BIGINT)
         |    ELSE CAST(CAST(coalesce(o.n_obs, 0) AS HUGEINT) * 1000000
         |      // t.n_total AS BIGINT) END AS obs_ppm,
         |  e.exp_ppm,
         |  CASE WHEN t.n_total = 0 THEN CAST(NULL AS BIGINT)
         |    ELSE CAST(CAST(coalesce(o.n_obs, 0) AS HUGEINT) * 1000000
         |      // t.n_total AS BIGINT) END - e.exp_ppm AS dev_ppm
         |FROM expected e LEFT JOIN obs o ON e.digit = o.digit, tot t"""
        .stripMargin
    })
}
