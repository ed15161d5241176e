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
        |  LIMIT 3) t""".stripMargin)
}
