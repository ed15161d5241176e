package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** SQL-surface parity operators the parity rows don't yet exercise:
  * value-based RANGE window frames and correlated LATERAL subqueries.
  * Both are features a reference user migrating real SQL would hit
  * immediately, and both have subtleties worth pinning under the gate
  * (RANGE peers vs ROWS offsets; LATERAL per-row re-execution ≡ a
  * ranked window when the inner query is a top-k).
  *
  *   - q_range_frame_sum — trailing 7-DAY sum per supplier over the
  *     (supplier, day) aggregate, `RANGE BETWEEN 6 PRECEDING AND
  *     CURRENT ROW` on the integer day value: calendar gaps shrink the
  *     frame (a ROWS frame would silently span them — the bug this
  *     query exists to keep out).
  *   - q_lateral_topk — top-3 orders by value per nation through a
  *     correlated LATERAL subquery on the SQL surface (the
  *     decorrelator turns it into the ranked-window plan, not a
  *     per-nation re-execution — same contract DuckDB applies).
  *
  * 100 TB posture: the RANGE window runs over the (supplier, day)
  * AGGREGATE (bounded by suppliers × span); the lateral decorrelates to
  * one nation-keyed window over orders (nation join broadcasts).
  */
object SqlSurface {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_range_frame_sum" -> { (s, dir) =>
      val byDay = Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey"),
          datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
            .cast("long").as("day"),
          col("l_quantity").cast(DecimalType(18, 2)).as("qty"))
        .groupBy(col("l_suppkey"), col("day"))
        .agg(sum(col("qty")).as("day_qty"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("day"))
        .rangeBetween(-6, 0)
      byDay
        .withColumn("trailing_7d_qty",
          sum(col("day_qty")).over(w).cast("double"))
        .select(col("l_suppkey"), col("day"),
          col("day_qty").cast("double").as("day_qty"),
          col("trailing_7d_qty"))
    },

    "q_lateral_topk" -> { (s, dir) =>
      Seq("nation", "customer", "orders")
        .foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
      s.sql("""
        SELECT n.n_name, t.o_orderkey, t.price_cents
        FROM nation n,
        LATERAL (
          SELECT o_orderkey,
            CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
          FROM orders JOIN customer ON o_custkey = c_custkey
          WHERE c_nationkey = n.n_nationkey
          ORDER BY price_cents DESC, o_orderkey ASC
          LIMIT 3) t""")
    },

    // ── array aggregation surface (collect_set → sorted → joined) ──────
    // The LISTAGG/string_agg parity row: per order priority, the sorted
    // distinct status set both as a joined string and as cardinality.
    // Sorting before joining is what makes a set aggregate
    // deterministic — the gate would catch any engine emitting
    // arrival order. Output stays scalar (strings), so the hash
    // compare never depends on array formatting.
    "q_collect_sorted" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(concat_ws(",",
            sort_array(collect_set(col("o_orderstatus"))))
            .as("statuses"),
          countDistinct(col("o_orderstatus")).as("n_statuses"),
          count(lit(1)).as("n_orders"))
    },

    // ── cume_dist / percent_rank over bounded month partitions ─────────
    // The distribution-window parity row q_window_ntile doesn't cover:
    // each day's order volume ranked within its MONTH (partitions ≤ 31
    // rows by construction — the bounded-window discipline). Both
    // functions emit single IEEE divisions of the same small integers,
    // so the doubles match bit-for-bit across engines.
    "q_window_cume" -> { (s, dir) =>
      val daily = Tables.load(s, dir, "orders")
        .select(date_trunc("month", to_date(col("o_orderdate")))
            .cast("date").cast("string").as("month"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
            .cast("long").as("day"))
        .groupBy(col("month"), col("day"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("month"))
        .orderBy(col("c").asc, col("day").asc)
      daily.select(col("month"), col("day"), col("c"),
        cume_dist().over(w).as("cume"),
        percent_rank().over(w).as("pct_rank"))
    },

    // ── regexp function surface (extract / count / replace / rlike) ────
    // The pattern-matching parity row beside q_pii_scrub's redaction
    // rules: per event type, rows matching a digit-run, total match
    // count, extracted-first-number sum, and replaced-length delta —
    // RE2-safe patterns only (both engines), all reduced to integers.
    "q_regexp_ops" -> { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_type"),
          col("props").rlike("[0-9]{2}").cast("long").as("hit"),
          expr("size(regexp_extract_all(props, '[0-9]+', 0))")
            .cast("long").as("m"),
          expr("CAST(coalesce(nullif(regexp_extract(props," +
            " '([0-9]+)', 1), ''), '0') AS BIGINT)").as("first_num"),
          (length(col("props")) -
            length(regexp_replace(col("props"), "[0-9]", "")))
            .cast("long").as("digit_chars"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("hit")).as("n_hit"),
          sum(col("m")).as("n_matches"),
          sum(col("first_num")).as("sum_first"),
          sum(col("digit_chars")).as("n_digit_chars"))
    },

    // ── VARIANT semi-structured surface (Spark 4 parse_json) ───────────
    // The open-schema path beside q_json_extract's from_json(MapType):
    // parse once into VariantType, extract typed paths with
    // variant_get — the shredding-friendly representation a lakehouse
    // keeps for evolving payloads (typed extraction without declaring
    // the full schema up front). Reduced per type so the gate compares
    // VALUES, not variant internals.
    "q_variant_extract" -> { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_missing"),
          sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
          sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_over_50"))
    },

    // ── percentile_cont surface parity (WITHIN GROUP ordered-set agg) ──
    // The interpolating-quantile API row: continuous median of order
    // value per priority. At 0.5 the interpolation is the exact
    // midpoint of the two middle order statistics — integer cents make
    // that a .0/.5 double both engines hit bit-exactly. SURFACE parity
    // only: the ordered-set aggregate buffers each group's values, so
    // the 100 TB path remains q_quantiles' value-grouped discrete rule;
    // this row exists because a migrating user's ad-hoc SQL says
    // percentile_cont, not because the engine should.
    "q_percentile_cont" -> { (s, dir) =>
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""
        SELECT o_orderpriority, count(*) AS n,
          percentile_cont(0.5) WITHIN GROUP (ORDER BY
            CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            AS median_cents
        FROM orders GROUP BY o_orderpriority""")
    },

    // ── higher-order-function surface over array columns ───────────────
    // transform / filter / aggregate / zip_with / exists / forall on the
    // embedding vectors, quantized first so every fold is integer-exact
    // (the HOF parity row — graft's hot vector kernels use native
    // codegen'd expressions instead because HOFs are CodegenFallback;
    // this pins the SEMANTICS a reference user writing ad-hoc lambda
    // pipelines relies on). rev_dot (zip_with against the reversed
    // vector) is the order-sensitive case a wrong fold direction fails.
    "q_hof_ops" -> { (s, dir) =>
      Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), expr(
          "transform(embedding," +
            " x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT))")
          .as("t"))
        .select(col("vec_id"),
          size(col("t")).cast("long").as("n_dims"),
          expr("CAST(size(filter(t, v -> v > 0)) AS BIGINT)").as("n_pos"),
          expr("aggregate(t, CAST(0 AS BIGINT), (acc, v) -> acc + v)")
            .as("sum_q"),
          expr("aggregate(t, CAST(0 AS BIGINT)," +
            " (acc, v) -> acc + abs(v))").as("l1_q"),
          expr("aggregate(zip_with(t, reverse(t), (a, b) -> a * b)," +
            " CAST(0 AS BIGINT), (acc, v) -> acc + v)").as("rev_dot_q"),
          expr("CAST(exists(t, v -> v < -1024) AS INT)").as("has_lt_neg1"),
          expr("CAST(forall(t, v -> abs(v) <= 4096) AS INT)")
            .as("all_small"))
    },

    // ── approx_percentile under the TOLERANCE gate ─────────────────────
    // The q_profile_approx trick for quantiles: sketch internals can
    // never hash-match across engines, so each engine checks its OWN
    // approximate p50/p95 against its OWN exact discrete quantile and
    // emits the engine-independent verdict (within the value band
    // spanned by ±2 % of rank). Exact side uses the value-grouped
    // cumulative rule (q_quantiles' shape), never a raw-row sort.
    "q_quantile_approx" -> { (s, dir) =>
      val e = Tables.load(s, dir, "events")
        .select(col("event_type"),
          expr("CAST(floor(value) AS BIGINT)").as("v"))
      val byVal = e.groupBy(col("event_type"), col("v"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("event_type"))
      // exact discrete quantile BANDS at rank ±2 %: [lo_p, hi_p]
      val bands = byVal.withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(wAll))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          min(when(expr("cum * 100 >= n * 48"), col("v"))).as("p50_lo"),
          min(when(expr("cum * 100 >= n * 52"), col("v"))).as("p50_hi"),
          min(when(expr("cum * 100 >= n * 93"), col("v"))).as("p95_lo"),
          min(when(expr("cum * 100 >= n * 97"), col("v"))).as("p95_hi"))
      val approx = e.groupBy(col("event_type"))
        .agg(expr("approx_percentile(v, 0.5)").as("a50"),
          expr("approx_percentile(v, 0.95)").as("a95"))
      bands.join(approx, Seq("event_type"))
        .select(col("event_type"), col("n"),
          (col("a50") >= col("p50_lo") && col("a50") <= col("p50_hi"))
            .cast("int").as("p50_within_band"),
          (col("a95") >= col("p95_lo") && col("a95") <= col("p95_hi"))
            .cast("int").as("p95_within_band"))
    })

  val oracle: Map[String, String] = Map(

    "q_range_frame_sum" ->
      """WITH byday AS (SELECT l_suppkey,
        |    datediff('day', DATE '1970-01-01',
        |      CAST(l_shipdate AS DATE)) AS day,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      AS day_qty,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS day_qty_d
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_suppkey, CAST(day AS BIGINT) AS day, day_qty,
        |  CAST(sum(day_qty_d) OVER (PARTITION BY l_suppkey
        |    ORDER BY day ASC
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS trailing_7d_qty
        |FROM byday""".stripMargin,

    "q_lateral_topk" ->
      """SELECT n.n_name, t.o_orderkey, t.price_cents
        |FROM nation n,
        |LATERAL (
        |  SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_nationkey = n.n_nationkey
        |  ORDER BY price_cents DESC, o_orderkey ASC
        |  LIMIT 3) t""".stripMargin,

    "q_collect_sorted" ->
      """SELECT o_orderpriority,
        |  string_agg(DISTINCT o_orderstatus, ','
        |    ORDER BY o_orderstatus) AS statuses,
        |  count(DISTINCT o_orderstatus) AS n_statuses,
        |  count(*) AS n_orders
        |FROM orders GROUP BY 1""".stripMargin,

    "q_window_cume" ->
      """WITH daily AS (SELECT
        |    CAST(CAST(date_trunc('month', o_orderdate) AS DATE)
        |      AS VARCHAR) AS month,
        |    date_diff('day', DATE '1970-01-01', o_orderdate) AS day,
        |    count(*) AS c
        |  FROM orders GROUP BY 1, 2)
        |SELECT month, CAST(day AS BIGINT) AS day, c,
        |  cume_dist() OVER w AS cume,
        |  percent_rank() OVER w AS pct_rank
        |FROM daily
        |WINDOW w AS (PARTITION BY month ORDER BY c ASC, day ASC)"""
        .stripMargin,

    "q_regexp_ops" ->
      """WITH r AS (SELECT event_type,
        |    CAST(regexp_matches(props, '[0-9]{2}') AS INT) AS hit,
        |    len(regexp_extract_all(props, '[0-9]+')) AS m,
        |    CAST(coalesce(nullif(regexp_extract(props, '([0-9]+)', 1),
        |      ''), '0') AS BIGINT) AS first_num,
        |    length(props) - length(regexp_replace(props, '[0-9]', '',
        |      'g')) AS digit_chars
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(hit) AS BIGINT) AS n_hit,
        |  CAST(sum(m) AS BIGINT) AS n_matches,
        |  CAST(sum(first_num) AS BIGINT) AS sum_first,
        |  CAST(sum(digit_chars) AS BIGINT) AS n_digit_chars
        |FROM r GROUP BY 1""".stripMargin,

    "q_variant_extract" ->
      """WITH v AS (SELECT event_type,
        |    CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_missing,
        |  CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k,
        |  CAST(sum(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_over_50
        |FROM v GROUP BY 1""".stripMargin,

    "q_percentile_cont" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  quantile_cont(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT),
        |    0.5) AS median_cents
        |FROM orders GROUP BY 1""".stripMargin,

    "q_hof_ops" ->
      """WITH t0 AS (SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS t
        |  FROM embeddings)
        |SELECT vec_id,
        |  CAST(len(t) AS BIGINT) AS n_dims,
        |  CAST(len(list_filter(t, v -> v > 0)) AS BIGINT) AS n_pos,
        |  CAST(list_sum(t) AS BIGINT) AS sum_q,
        |  CAST(list_sum(list_transform(t, v -> abs(v))) AS BIGINT) AS l1_q,
        |  CAST(list_sum(list_transform(range(1, len(t) + 1),
        |    i -> t[i] * t[len(t) - CAST(i AS INT) + 1])) AS BIGINT)
        |    AS rev_dot_q,
        |  CAST(len(list_filter(t, v -> v < -1024)) > 0 AS INT)
        |    AS has_lt_neg1,
        |  CAST(len(list_filter(t, v -> abs(v) > 4096)) = 0 AS INT)
        |    AS all_small
        |FROM t0""".stripMargin,

    "q_quantile_approx" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value) AS BIGINT) AS v FROM events),
        |bv AS (SELECT event_type, v, count(*) AS c
        |  FROM e GROUP BY 1, 2),
        |cm AS (SELECT event_type, v,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(c) OVER (PARTITION BY event_type) AS n
        |  FROM bv),
        |bands AS (SELECT event_type, max(n) AS n,
        |    min(CASE WHEN cum * 100 >= n * 48 THEN v END) AS p50_lo,
        |    min(CASE WHEN cum * 100 >= n * 52 THEN v END) AS p50_hi,
        |    min(CASE WHEN cum * 100 >= n * 93 THEN v END) AS p95_lo,
        |    min(CASE WHEN cum * 100 >= n * 97 THEN v END) AS p95_hi
        |  FROM cm GROUP BY 1),
        |ap AS (SELECT event_type,
        |    approx_quantile(v, 0.5) AS a50,
        |    approx_quantile(v, 0.95) AS a95
        |  FROM e GROUP BY 1)
        |SELECT b.event_type, CAST(b.n AS BIGINT) AS n,
        |  CAST(a.a50 >= b.p50_lo AND a.a50 <= b.p50_hi AS INT)
        |    AS p50_within_band,
        |  CAST(a.a95 >= b.p95_lo AND a.a95 <= b.p95_hi AS INT)
        |    AS p95_within_band
        |FROM bands b JOIN ap a ON a.event_type = b.event_type""".stripMargin)
}
