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
