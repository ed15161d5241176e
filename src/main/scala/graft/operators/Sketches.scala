package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Mergeable distinct-count sketch tables over Spark's built-in
  * DataSketches HLL functions (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate`) — the 100 TB profile pattern the one-shot
  * `approx_count_distinct` cannot give you:
  *
  *   - build ONE small sketch per partition unit (day, source, shard)
  *     at ingest time and PERSIST it — the corpus-sized scan happens
  *     once, when the data is written;
  *   - answer "distinct users over any day range / source subset" by
  *     unioning the selected sketches — register-maxima merges are
  *     associative, commutative, and idempotent, so the query cost is
  *     O(|sketches|), never a rescan;
  *   - the estimate after any grouping of the same rows is IDENTICAL
  *     (merge exactness — pinned by spec), so incremental daily
  *     maintenance and a from-scratch rebuild agree bit-for-bit.
  *
  * Spec-only (no DuckDB oracle): sketch bytes are engine-specific by
  * nature — the same reason q_profile_approx is the one rows-only
  * waiver. SketchSpec pins merge exactness, incremental-vs-rebuild
  * agreement, and estimate accuracy against the exact count.
  */
object Sketches {

  /** One HLL sketch of `keyCol` per `unitCol` value (e.g. per day):
    * the persisted profile-state table. lgK = 12 ⇒ ~2 KB per sketch,
    * ~1.6 % relative standard error.
    */
  def sketchByUnit(df: DataFrame, unitCol: String, keyCol: String,
                   lgK: Int = 12): DataFrame =
    df.groupBy(col(unitCol))
      .agg(expr(s"hll_sketch_agg($keyCol, $lgK)").as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Union a (filtered) sketch table into one distinct estimate —
    * O(|sketches|), no raw-data rescan.
    */
  def mergedEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(
      expr("hll_sketch_estimate(hll_union_agg(sketch))")
        .cast("long").as("n_distinct"),
      sum(col("n_rows")).as("n_rows"))

  /** One Misra–Gries heavy-hitters sketch of `keyCol` per `unitCol`
    * value — the persisted top-k profile state (graft's `freq_sketch`
    * TypedImperativeAggregate; requires GraftExtensions).
    */
  def freqByUnit(df: DataFrame, unitCol: String, keyCol: String,
                 capacity: Int = 64): DataFrame =
    df.groupBy(col(unitCol))
      .agg(expr(s"freq_sketch($keyCol, $capacity)").as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Union a table of persisted freq sketches into one summary with
    * the PODS'12 Misra–Gries merge, entirely in DataFrame ops:
    * keywise count sum, then subtract the (capacity+1)-th largest
    * count and drop ≤ 0. The (cap+1)-sized cut list comes from ONE
    * `bounded_topk` aggregate (k-capped partials), so merging any
    * number of sketches shuffles |sketches|·capacity tiny rows and
    * never rescans raw data. Output mirrors freq_sketch rows:
    * (t, c) sorted by consumer.
    */
  def mergedFreq(sketches: DataFrame, capacity: Int = 64): DataFrame = {
    val summed = sketches
      .select(explode(col("sketch")).as("e"))
      .groupBy(col("e.t").as("t"))
      .agg(sum(col("e.c")).as("c"))
    // top cap+1 by count desc (score = −count). The id slot is filled
    // with hash(t) ONLY because bounded_topk wants a payload — it is
    // NOT a clean tiebreak (hash collisions exist, and no downstream
    // reader consumes it): the only value read out is the (cap+1)-th
    // SCORE, and when counts tie at the cut every choice of survivor
    // yields the same threshold d, so ties/collisions are harmless
    val cut = summed
      .agg(expr(
        s"bounded_topk(cast(-c as double), cast(hash(t) as bigint), ${capacity + 1})")
        .as("top"))
      .select(
        when(size(col("top")) > capacity,
          (-col("top").getItem(capacity).getField("s")).cast("long"))
          .otherwise(lit(0L)).as("d"))
    summed.crossJoin(broadcast(cut))
      .filter(col("c") - col("d") > 0)
      .select(col("t"), (col("c") - col("d")).as("c"))
  }

  /** KMV sketch size: k minimum hash values kept per unit. Relative
    * standard error ≈ 1/√(k−2) ≈ 6.3 %.
    */
  private[graft] val KMV_K = 256

  /** 2⁵² — the KMV hash range (13 md5 hex digits). 52 bits so the hash
    * is EXACT as a double inside `bounded_topk`'s score slot, and
    * (k−1)·2⁵² stays far under int64.
    */
  private[graft] val KMV_RANGE = 4503599627370496L

  /** Oracle-gated twin of the HLL tier: the KMV (k-minimum-values)
    * distinct sketch (Bar-Yossef et al., RANDOM'02) is built from a
    * deterministic md5-derived hash, so — unlike HLL register bytes —
    * the SAME sketch falls out of any engine and the whole estimator
    * runs under the driver's hash gate. Estimate = (k−1)·2⁵² div h_(k)
    * (exact integer division; < k distinct values ⇒ the sketch IS the
    * exact answer).
    *
    * Scale shape: distinct-pair aggregate (map-side combine) →
    * `bounded_topk` k-capped partials per unit — merging any number of
    * unit sketches is re-running bounded_topk over ≤ |units|·k rows,
    * never a raw rescan; the `__all__` row is EXACTLY that merge (its
    * correctness vs the global exact count is the merge-exactness
    * proof HLL can only pin in a spec).
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── range-DISTINCT from dyadic KMV profile state ────────────────────
    // q_cms_range's companion: "how many DISTINCT users in [Jan 8,
    // Jan 21]?" from persisted per-block sketches. One KMV per dyadic
    // block of the minute index; a range query unions the ≤ 2·L cover
    // blocks' sketches and reads the estimator off the merged k-minimum
    // set. Merge correctness is exact, not approximate: the k smallest
    // of a union equal the k smallest of the union of per-set k-smallest
    // (any global survivor is among its own block's k smallest), so the
    // merged sketch IS the sketch of the range — which is why the oracle
    // can re-derive it from the raw rows and the hash gate applies.
    //
    // Scale: the corpus-sized work is one distinct (minute, hash) pass +
    // one level fan-out into k-capped bounded_topk partials (map-side
    // combined; state = |blocks|·k longs); the query itself touches
    // |cover|·k rows. When the range's true distinct count is below k
    // the merged sketch is the exact answer by the same argument.
    "q_kmv_range" -> { (s, dir) =>
      import CountMin.{RANGE_LEVELS, RANGE_LO_MIN, RANGE_HI_MIN}
      val ev = Tables.load(s, dir, "events")
      val mh = ev.select(Tables.epochMs(ev).as("ms"),
          conv(substring(md5(concat(lit("kmv:"),
            col("user_id").cast("string"))), 1, 13), 16, 10)
            .cast("long").as("h"))
        .selectExpr("ms div 60000 AS m", "h").distinct()
      val lj = mh.select(col("h"), explode(array(
          (0 until RANGE_LEVELS).map { l =>
            struct(lit(l).as("l"), shiftright(col("m"), l).as("j"))
          }: _*)).as("b"))
        .select(col("b.l").as("l"), col("b.j").as("j"), col("h"))
        .distinct()
      val sk = lj.groupBy(col("l"), col("j"))
        .agg(expr(s"bounded_topk(cast(h as double), h, $KMV_K)")
          .as("top"))
      val coverDf = {
        import s.implicits._
        CountMin.dyadicCover(RANGE_LO_MIN, RANGE_HI_MIN).toDF("l", "j")
      }
      val merged = sk.join(broadcast(coverDf), Seq("l", "j"))
        .select(explode(col("top")).as("e"))
        .select(col("e.n").as("h")).distinct()
        .agg(expr(s"bounded_topk(cast(h as double), h, $KMV_K)").as("top"))
      val exact = mh
        .filter(col("m").between(RANGE_LO_MIN, RANGE_HI_MIN))
        .select(col("h")).distinct()
        .agg(count(lit(1)).as("exact_distinct"))
      exact.crossJoin(broadcast(merged))
        .select(col("exact_distinct"),
          when(size(col("top")) === KMV_K,
            expr(s"${(KMV_K - 1).toLong} * $KMV_RANGE" +
              s" div get(top, ${KMV_K - 1}).n"))
            .otherwise(size(col("top")).cast("long"))
            .as("est_distinct"))
        .withColumn("within_15pct",
          (abs(col("est_distinct") - col("exact_distinct")) * 100 <=
            col("exact_distinct") * 15).cast("int"))
    },

    "q_kmv_distinct" -> { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      // distinct (unit, 52-bit hash): duplicates never advance a KMV
      val dh = e.select(col("event_type"),
        conv(substring(md5(concat(lit("kmv:"),
          col("user_id").cast("string"))), 1, 13), 16, 10)
          .cast("long").as("h"))
        .distinct()
      // get() (null past-the-end), not [..]: ANSI throws on the short
      // array even under a false CASE branch (subexpression hoisting)
      def estCols(df: DataFrame): DataFrame = df.select(
        col("event_type"), col("n_distinct"),
        when(col("n_distinct") >= KMV_K,
          expr(s"get(top, ${KMV_K - 1}).n")).as("kth_h"),
        when(col("n_distinct") >= KMV_K,
          expr(s"${(KMV_K - 1).toLong} * $KMV_RANGE" +
            s" div get(top, ${KMV_K - 1}).n"))
          .otherwise(col("n_distinct")).as("est_distinct"))
        .withColumn("within_15pct",
          (abs(col("est_distinct") - col("n_distinct")) * 100 <=
            col("n_distinct") * 15).cast("int"))
      val perType = estCols(dh.groupBy(col("event_type"))
        .agg(expr(s"bounded_topk(cast(h as double), h, $KMV_K)").as("top"),
          count(lit(1)).as("n_distinct")))
      // merged sketch: k smallest of the UNION of per-type sketch
      // contents == the global k smallest (each global survivor is in
      // its own type's sketch) — accuracy vs the exact global count is
      // checked against a separate one-column distinct aggregate
      val exact = dh.select(col("h")).distinct()
        .agg(count(lit(1)).as("n_distinct"))
      val merged = estCols(dh.groupBy(col("event_type"))
        .agg(expr(s"bounded_topk(cast(h as double), h, $KMV_K)").as("top"))
        .select(explode(col("top")).as("e"))
        .select(col("e.n").as("h")).distinct()
        .agg(expr(s"bounded_topk(cast(h as double), h, $KMV_K)").as("top"))
        .crossJoin(broadcast(exact))
        .select(lit("__all__").as("event_type"), col("n_distinct"),
          col("top")))
      perType.unionByName(merged)
    })

  val oracle: Map[String, String] = Map(
    "q_kmv_range" -> {
      import CountMin.{RANGE_LO_MIN, RANGE_HI_MIN}
      s"""WITH ev AS (SELECT epoch_ms(ts) // 60000 AS m,
         |    CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)),
         |      1, 13)) AS BIGINT) AS h
         |  FROM events),
         |r AS (SELECT DISTINCT h FROM ev
         |  WHERE m BETWEEN $RANGE_LO_MIN AND $RANGE_HI_MIN),
         |rk AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM r),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS exact_distinct,
         |    max(CASE WHEN rn = $KMV_K THEN h END) AS kth FROM rk),
         |e AS (SELECT exact_distinct,
         |    CASE WHEN exact_distinct >= $KMV_K
         |      THEN ${(KMV_K - 1).toLong} * $KMV_RANGE // kth
         |      ELSE exact_distinct END AS est_distinct
         |  FROM a)
         |SELECT exact_distinct, est_distinct,
         |  CAST(abs(est_distinct - exact_distinct) * 100
         |    <= exact_distinct * 15 AS INT) AS within_15pct
         |FROM e""".stripMargin
    },

    "q_kmv_distinct" ->
      s"""WITH dh AS (SELECT DISTINCT event_type,
         |    CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)),
         |      1, 13)) AS BIGINT) AS h
         |  FROM events),
         |r AS (SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n_distinct
         |  FROM dh),
         |per AS (SELECT event_type,
         |    CAST(max(n_distinct) AS BIGINT) AS n_distinct,
         |    max(CASE WHEN rn = $KMV_K THEN h END) AS kth_h
         |  FROM r GROUP BY 1),
         |u AS (SELECT DISTINCT h FROM r WHERE rn <= $KMV_K),
         |ur AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM u),
         |gx AS (SELECT CAST(count(DISTINCT h) AS BIGINT) AS n_distinct
         |  FROM dh),
         |allrow AS (SELECT '__all__' AS event_type, gx.n_distinct,
         |    (SELECT max(CASE WHEN rn = $KMV_K THEN h END) FROM ur) AS kth_h
         |  FROM gx),
         |rows0 AS (SELECT * FROM per UNION ALL SELECT * FROM allrow),
         |est AS (SELECT event_type, n_distinct, kth_h,
         |    CASE WHEN n_distinct >= $KMV_K
         |      THEN ${(KMV_K - 1).toLong} * $KMV_RANGE // kth_h
         |      ELSE n_distinct END AS est_distinct
         |  FROM rows0)
         |SELECT event_type, n_distinct, kth_h, est_distinct,
         |  CAST(abs(est_distinct - n_distinct) * 100
         |    <= n_distinct * 15 AS INT) AS within_15pct
         |FROM est""".stripMargin)
}
