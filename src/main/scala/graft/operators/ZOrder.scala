package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout clustering for multi-dimensional file
  * skipping.
  *
  * A table filtered on TWO independent columns can only be min/max-
  * pruned on one of them under a lexicographic sort: every file spans
  * the full range of the second column. Interleaving the bits of both
  * columns into one z-value and clustering on THAT gives every file a
  * tight range on BOTH dimensions (each z-range is a small axis-aligned
  * rectangle of the key space), so scan planners skip files for either
  * predicate — the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER
  * BY`.
  *
  * Everything here is pure integer bit arithmetic built from Spark
  * built-ins (shiftright/bitwiseAND/shiftleft folded over 16 unrolled
  * terms — one codegen'd expression, zero shuffle), with a
  * programmatically generated DuckDB SQL twin so the oracle stays
  * structurally in lock-step.
  *
  * 100 TB shape: the z-value is a per-row projection; the physical
  * re-layout is `repartitionByRange($"zval")` + sorted write (one range
  * shuffle, the same cost as any global sort-write). The q_zorder_layout
  * query instead buckets by the HIGH BITS of the z-value — fixed-width
  * z-ranges need no sort at all (one hash aggregate), and the per-bucket
  * min/max spans it reports are exactly the file-footer stats a pruning
  * scanner would consult.
  */
object ZOrder {

  /** Bits taken from each dimension (z-value = 2·BITS wide). */
  val BITS = 16

  /** q_zorder_layout bucket shift: fixing z-bits ≥10 makes every bucket
    * a 32×32 axis-aligned cell — tight min/max on BOTH dimensions for
    * the key ranges in this corpus (partkey < 2048, suppkey < 128).
    */
  val LAYOUT_SHIFT = 10

  private val MASK = (1L << BITS) - 1

  /** Morton interleave of the low 16 bits of two non-negative integral
    * columns: bit i of `x` lands at z-bit 2i, bit i of `y` at 2i+1.
    * Unrolled fold — one flat codegen'd expression.
    */
  def zValue(x: Column, y: Column): Column = {
    val xb = x.cast("bigint").bitwiseAND(lit(MASK))
    val yb = y.cast("bigint").bitwiseAND(lit(MASK))
    (0 until BITS).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xb, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** DuckDB twin of [[zValue]] over SQL expressions `x`, `y` —
    * disjoint-bit terms summed (equivalent to OR), fully parenthesized.
    */
  def zValueSql(x: String, y: String): String = {
    val terms = (0 until BITS).flatMap { i =>
      Seq(
        s"(((($x) & $MASK) >> $i & 1) << ${2 * i})",
        s"(((($y) & $MASK) >> $i & 1) << ${2 * i + 1})")
    }
    terms.mkString("(", " + ", ")")
  }

  /** Per-z-bucket layout statistics: bucket rows by the z-value's high
    * bits (`zval >> shift` — fixed-width z-ranges, no global sort) and
    * report the min/max of both dimensions per bucket: the file-footer
    * stats a min/max-pruning scan would use. One hash aggregate.
    */
  def spanByBucket(df: DataFrame, x: Column, y: Column,
                   shift: Int): DataFrame =
    df.select(x.as("x"), y.as("y"),
        shiftright(zValue(x, y), shift).as("zbucket"))
      .groupBy(col("zbucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))

  /** q_zone_pruning: linear-layout "file" width (orderkey range per
    * bucket) — the insertion-ordered strawman the z-layout is judged
    * against.
    */
  val LINEAR_DIV = 256

  /** q_zone_pruning probe-set size and selection-hash seed. */
  val PROBE_K = 32
  val PROBE_SEED = 43

  /** q_zone_pruning — MEASURED file-skipping effectiveness, z-order vs
    * insertion order.
    *
    * q_zorder_layout reports the per-bucket min/max spans; this query
    * closes the loop by actually USING them: take a deterministic probe
    * set of (partkey, suppkey) point predicates, evaluate every probe
    * against every bucket's zone map under the standard pruning rule
    * (scan iff the point lies inside BOTH min/max ranges), and report
    * the scanned share per layout. The z-layout's share collapsing vs
    * the linear layout's ~100 % is the quantified case for paying the
    * one-time re-layout shuffle — the number a 100 TB table owner reads
    * before running OPTIMIZE ZORDER BY.
    *
    * Scale: zone maps are ONE aggregate over a single scan (both
    * layouts' bucket ids explode from the same row — 2 rows per input
    * row, still map-side combined); the zone-map table is |files|-sized
    * (bounded by layout construction, never by row count); probes are a
    * TakeOrdered(PROBE_K) over the distinct key-pair table; the
    * probe×zonemap evaluation is a PROBE_K-row broadcast against the
    * bounded zone-map table.
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zone_pruning" -> { (s, dir) =>
      val li = graft.Tables.load(s, dir, "lineitem")
        .select(col("l_partkey").as("x"), col("l_suppkey").as("y"),
          col("l_orderkey").as("ok"))
      val zm = li
        .select(col("x"), col("y"), explode(array(
          struct(lit("zorder").as("layout"),
            shiftright(zValue(col("x"), col("y")), LAYOUT_SHIFT)
              .as("b")),
          struct(lit("linear").as("layout"),
            expr(s"ok div $LINEAR_DIV").as("b")))).as("lb"))
        .groupBy(col("lb.layout").as("layout"), col("lb.b").as("b"))
        .agg(min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      val probes = li.select(col("x").as("px"), col("y").as("ps"))
        .distinct()
        .withColumn("h", Dedup.hash32(PROBE_SEED,
          concat(col("px").cast("string"), lit(":"),
            col("ps").cast("string"))))
        .orderBy(col("h").asc, col("px").asc, col("ps").asc)
        .limit(PROBE_K)
        .select(col("px"), col("ps"))
      val nProbes = probes.agg(count(lit(1)).as("n_probes"))
      val scanned = zm.join(broadcast(probes),
          col("px").between(col("x_min"), col("x_max")) &&
            col("ps").between(col("y_min"), col("y_max")))
        .groupBy(col("layout"))
        .agg(count(lit(1)).as("scanned_pairs"))
      zm.groupBy(col("layout")).agg(count(lit(1)).as("n_buckets"))
        .join(scanned, Seq("layout"), "left")
        .na.fill(0L, Seq("scanned_pairs"))
        .crossJoin(broadcast(nProbes))
        .select(col("layout"), col("n_buckets"), col("n_probes"),
          col("scanned_pairs"),
          expr("scanned_pairs * 10000 div (n_probes * n_buckets)")
            .as("scanned_share_bp"))
    })

  val oracle: Map[String, String] = Map(
    "q_zone_pruning" ->
      s"""WITH li AS (SELECT l_partkey AS x, l_suppkey AS y,
         |    l_orderkey AS ok FROM lineitem),
         |m AS (SELECT 'zorder' AS layout,
         |    ${zValueSql("x", "y")} >> $LAYOUT_SHIFT AS b, x, y FROM li
         |  UNION ALL
         |  SELECT 'linear', ok // $LINEAR_DIV, x, y FROM li),
         |zm AS (SELECT layout, b, min(x) AS x_min, max(x) AS x_max,
         |    min(y) AS y_min, max(y) AS y_max
         |  FROM m GROUP BY 1, 2),
         |dp AS (SELECT DISTINCT x AS px, y AS ps FROM li),
         |pr AS (SELECT px, ps FROM dp
         |  ORDER BY ${Dedup.hash32Sql(PROBE_SEED,
             "CAST(px AS VARCHAR) || ':' || CAST(ps AS VARCHAR)")},
         |    px, ps LIMIT $PROBE_K),
         |np AS (SELECT count(*) AS n_probes FROM pr),
         |sc AS (SELECT layout, count(*) AS scanned_pairs
         |  FROM zm JOIN pr ON pr.px BETWEEN zm.x_min AND zm.x_max
         |    AND pr.ps BETWEEN zm.y_min AND zm.y_max
         |  GROUP BY 1),
         |nb AS (SELECT layout, count(*) AS n_buckets FROM zm GROUP BY 1)
         |SELECT nb.layout, nb.n_buckets, np.n_probes,
         |  coalesce(sc.scanned_pairs, 0) AS scanned_pairs,
         |  coalesce(sc.scanned_pairs, 0) * 10000
         |    // (np.n_probes * nb.n_buckets) AS scanned_share_bp
         |FROM nb LEFT JOIN sc ON sc.layout = nb.layout, np""".stripMargin)
}
