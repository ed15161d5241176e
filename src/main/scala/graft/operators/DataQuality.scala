package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deequ-style declarative data-quality suite: a fixed rule list
  * evaluated in the MINIMUM number of passes — one aggregate per
  * scanned table plus one anti-join for referential integrity — and
  * emitted as a uniform verdict table `(rule, metric_bp, pass)` with
  * all metrics in integer basis points (hash-stable across engines).
  *
  * This is the gate a pipeline runs before publishing a gold table:
  * completeness / uniqueness / domain-range on the fact, referential
  * integrity fact→dim. Thresholds live with the rules; `pass` is the
  * machine-readable bit an orchestrator branches on.
  *
  * 100 TB shape: rules over the same table FUSE into one
  * conditional-aggregation pass (no per-rule scans — the Deequ trick);
  * the referential check is a LeftAnti join that AQE broadcasts when
  * the dim's key set fits, and the verdict table is O(rules) rows.
  */
object DataQuality {

  /** The rule suite over lineitem (fact) and orders (dim). */
  def checks(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val ord = Tables.load(s, dir, "orders")

    // ONE pass over lineitem: completeness + domain rules as
    // conditional counts.
    val liAgg = li.agg(
      count(lit(1)).as("n"),
      count(col("l_quantity")).as("n_qty"),
      sum(when(col("l_discount") >= 0.0 && col("l_discount") <= 0.1, 1L)
        .otherwise(0L)).as("n_disc_ok"),
      sum(when(col("l_extendedprice") > 0.0, 1L).otherwise(0L))
        .as("n_price_ok"))

    // ONE pass over orders: row count + exact key cardinality.
    val ordAgg = ord.agg(
      count(lit(1)).as("n"),
      countDistinct(col("o_orderkey")).as("n_keys"))

    // Referential integrity: fact keys with no dim row (LeftAnti).
    val orphan = li.select(col("l_orderkey"))
      .join(ord.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))

    def bp(num: String, den: String) = expr(s"$num * 10000 div $den")

    val liRules = liAgg.select(explode(array(
      struct(lit("completeness_l_quantity").as("rule"),
        bp("n_qty", "n").as("metric_bp"),
        (col("n_qty") === col("n")).cast("int").as("pass")),
      struct(lit("range_l_discount_0_10pct").as("rule"),
        bp("n_disc_ok", "n").as("metric_bp"),
        (col("n_disc_ok") === col("n")).cast("int").as("pass")),
      struct(lit("positive_l_extendedprice").as("rule"),
        bp("n_price_ok", "n").as("metric_bp"),
        (col("n_price_ok") === col("n")).cast("int").as("pass"))))
      .as("r")).select(col("r.*"))

    val ordRules = ordAgg.select(explode(array(
      struct(lit("uniqueness_o_orderkey").as("rule"),
        bp("n_keys", "n").as("metric_bp"),
        (col("n_keys") === col("n")).cast("int").as("pass"))))
      .as("r")).select(col("r.*"))

    val refRule = orphan.select(
      lit("referential_lineitem_orders").as("rule"),
      col("n_orphans").as("metric_bp"),
      (col("n_orphans") === 0L).cast("int").as("pass"))

    liRules.unionByName(ordRules).unionByName(refRule)
  }

  /** DuckDB oracle twin of [[checks]] — same rules, same basis-point
    * arithmetic, UNION ALL of the per-table scalar aggregates.
    */
  val checksSql: String =
    """WITH li AS (SELECT count(*) AS n, count(l_quantity) AS n_qty,
      |    CAST(sum(CASE WHEN l_discount >= 0.0 AND l_discount <= 0.1
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_disc_ok,
      |    CAST(sum(CASE WHEN l_extendedprice > 0.0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_price_ok
      |  FROM lineitem),
      |ord AS (SELECT count(*) AS n, count(DISTINCT o_orderkey) AS n_keys
      |  FROM orders),
      |orph AS (SELECT count(*) AS n_orphans FROM lineitem
      |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
      |SELECT 'completeness_l_quantity' AS rule,
      |  n_qty * 10000 // n AS metric_bp,
      |  CAST(n_qty = n AS INT) AS pass FROM li
      |UNION ALL SELECT 'range_l_discount_0_10pct',
      |  n_disc_ok * 10000 // n, CAST(n_disc_ok = n AS INT) FROM li
      |UNION ALL SELECT 'positive_l_extendedprice',
      |  n_price_ok * 10000 // n, CAST(n_price_ok = n AS INT) FROM li
      |UNION ALL SELECT 'uniqueness_o_orderkey',
      |  n_keys * 10000 // n, CAST(n_keys = n AS INT) FROM ord
      |UNION ALL SELECT 'referential_lineitem_orders',
      |  n_orphans, CAST(n_orphans = 0 AS INT) FROM orph""".stripMargin
}
