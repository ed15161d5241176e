package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational operator parity queries (SURVEY.md §2), each paired with a
  * DuckDB oracle in [[oracle]]. Phrased over the TPC-H-ish test tables.
  *
  * Determinism rules (so the driver's hash compare is stable):
  *   - double aggregates go through DECIMAL(18,2/4): decimal addition is
  *     exact and associative, so Spark's partial-aggregate ordering and
  *     DuckDB's ordering produce identical results; the final value is cast
  *     back to double for a schema both engines agree on.
  *   - every window/top-k ordering carries a unique-key tiebreak.
  */
object RelationalQueries {

  /** q_interval_overlap: each order's activity window is 7 days. */
  private val OVERLAP_SPAN_DAYS = 7

  /** q_correlation: sample-selection hash seed. */
  private val CORR_SEED = 13

  /** q_hits_scores: HITS rounds (each = auth update + hub update). */
  private val HITS_ITERS = 2

  /** q_correlation: hard sample-size cap — the DECIMAL(38,0) headroom
    * proof (see the query comment) holds for n ≤ 20 000, so the sample
    * is BOUNDED by construction: deterministic bottom-k on a second
    * hash, not a fixed fraction that outgrows the proof with the data.
    */
  private val CORR_MAX_N = 20000

  /** q_correlation pairs: (var_x, var_y, Σxy, Σx, Σy, Σx², Σy²) over
    * the shared one-row sum aggregate.
    */
  private val CORR_PAIRS = Seq(
    ("quantity", "price", "sqp", "sq", "sp", "sqq", "spp"),
    ("quantity", "discount", "sqd", "sq", "sd", "sqq", "sdd"),
    ("price", "discount", "spd", "sp", "sd", "spp", "sdd"))

  /** Exact, order-insensitive sum of a 2-decimal double column → double. */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum of price*(1-discount) (scale-4 decimal product) → double. */
  private def revenueSum(price: Column, discount: Column): Column =
    sum(price.cast(DecimalType(18, 2)) *
      (lit(java.math.BigDecimal.ONE) - discount.cast(DecimalType(18, 2))))
      .cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── A1/A2-style headline aggregation (TPC-H Q1 flavor) ──────────────
    // Filter pushes to the parquet scan; partial aggregation map-side.
    "q1_agg" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("count_order"),
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          revenueSum(col("l_extendedprice"), col("l_discount"))
            .as("sum_disc_price"))
    },

    // ── P1: nested-free flatten-style projection + cast + alias ─────────
    // Reference: src/etl/bronze_to_silver.py:48-84 (select/cast/alias).
    "q_project_cast" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(
          col("l_orderkey").cast("long").as("orderkey"),
          col("l_linenumber").cast("int").as("linenumber"),
          floor(col("l_quantity")).cast("long").as("qty_floor"),
          col("l_returnflag").cast("string").as("returnflag"),
          (col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast("double").as("price"))
    },

    // ── P5: conditional null-normalization (single Project, not 27) ─────
    // Reference: src/etl/bronze_to_silver.py:117-124. Placeholder strings
    // NULL/Null/"" → real nulls; one select over all columns.
    "q_normalize_casewhen" -> { (s, dir) =>
      val df = Tables.load(s, dir, "customer")
      val strCols = Set("c_name", "c_mktsegment")
      df.select(df.columns.toSeq.map { c =>
        if (strCols(c)) graft.functions.Normalize.placeholderToNull(col(c)).as(c)
        else col(c)
      }: _*)
    },

    // ── P6/A1: one-pass profile (replaces the reference's ~105-job loop;
    // SURVEY.md §3.2). Null counts + exact distincts in a single aggregate.
    "q_profile_onepass" -> { (s, dir) =>
      Tables.load(s, dir, "orders").agg(
        count(lit(1)).as("n_rows"),
        count(when(col("o_custkey").isNull, 1)).as("nulls_custkey"),
        count(when(col("o_orderstatus").isNull, 1)).as("nulls_status"),
        countDistinct(col("o_orderstatus")).as("distinct_status"),
        countDistinct(col("o_orderpriority")).as("distinct_priority"))
    },

    // ── A2: distinct (cardinality profile) ──────────────────────────────
    "q_distinct" -> { (s, dir) =>
      Tables.load(s, dir, "orders").select(col("o_orderpriority")).distinct()
    },

    // ── A3: exact multi-column dedup (SELECT DISTINCT) ──────────────────
    "q_dedup_exact" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
    },

    // ── A4: keyed dedup with DETERMINISTIC survivor (row_number tiebreak;
    // reference dropDuplicates(subset) keeps an arbitrary row — SURVEY §7.4).
    // The tiebreak covers every projected column, so rows tied on the
    // ordering are identical in the output (synthetic lineitem has
    // duplicate (orderkey, linenumber) pairs).
    "q_dedup_keyed" -> { (s, dir) =>
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber").asc, col("l_partkey").asc)
      Tables.load(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    },

    // ── S6: merge-upsert (unionByName + keyed dedup, new-rows-win).
    // Reference: src/utils/bucket.py:63-89. Simulated: "existing" = orders
    // before 1999, "incoming" = orders from 1998 (overlap year forces the
    // dedup path). Deterministic survivor: incoming wins, then orderkey.
    "q_merge_upsert" -> { (s, dir) =>
      val orders = Tables.load(s, dir, "orders")
      val existing = orders
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .withColumn("src_rank", lit(2))
      val incoming = orders
        .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
        .withColumn("src_rank", lit(1))
      MergeUpsert.merge(existing, incoming, keys = Seq("o_orderkey"),
        tiebreak = Seq(col("src_rank").asc))
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("src_rank"))
    },

    // ── U1: unionByName with schema evolution (allowMissingColumns) ─────
    "q_union_by_name" -> { (s, dir) =>
      val a = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey").as("key"), col("s_name").as("name"),
          col("s_acctbal").as("acctbal"))
      val b = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("key"), col("c_name").as("name"),
          col("c_mktsegment").as("segment"))
      a.unionByName(b, allowMissingColumns = true)
    },

    // ── Joins: star join fact ⋈ dims, broadcast the small sides ─────────
    // (SURVEY §2.4: the gold star schema's intended consumption pattern.)
    "q_star_join" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(revenueSum(col("l_extendedprice"), col("l_discount"))
          .as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // ── O2: top-k (TakeOrderedAndProject) with unique tiebreak ──────────
    "q_topk" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },

    // ── trailing range-frame aggregation (moving sum) ───────────────────
    // The time-series smoothing shape: per supplier, the quantity sum
    // over a trailing 7-DAY window at each ship date — a RANGE frame
    // over epoch-day integers, so gaps in the calendar are handled by
    // VALUE distance, not row count (a rows-frame would silently widen
    // over sparse days). Pre-aggregating to one row per (supplier, day)
    // first keeps the window input |suppliers|×|days|, not row count —
    // the same pre-agg-then-window discipline as the quantile family.
    "q_trailing_sum" -> { (s, dir) =>
      val daily = Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey"),
          datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
            .as("day"),
          expr("CAST(l_quantity AS BIGINT)").as("qty"))
        .groupBy(col("l_suppkey"), col("day"))
        .agg(sum(col("qty")).as("day_qty"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("day"))
        .rangeBetween(-6L, 0L)
      daily.withColumn("qty_7d", sum(col("day_qty")).over(w))
    },

    // ── generic per-group top-k via the native bounded_topk ─────────────
    // Top-3 line items by price per supplier — the HIGH-cardinality
    // group top-k (thousands of suppliers), where a rank window would
    // work but bounded_topk's k-capped map-side partials ship ≤ k rows
    // per (task, supplier) into the one shuffle instead of every row.
    // Price in integer cents (floor(×100) is IEEE-exact in both
    // engines); (orderkey·100 + linenumber) packs the unique tiebreak
    // id into the aggregate's long id slot.
    "q_group_topk" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey"),
          expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
            .as("price_cents"),
          expr("l_orderkey * 100 + l_linenumber").as("item_id"))
        .groupBy(col("l_suppkey"))
        .agg(expr(
          "bounded_topk(CAST(-price_cents AS DOUBLE), item_id, 3)")
          .as("top"))
        .select(col("l_suppkey"), posexplode(col("top")))
        .toDF("l_suppkey", "pos", "t")
        .select(col("l_suppkey"), col("t.n").as("item_id"),
          expr("CAST(-t.s AS BIGINT)").as("price_cents"),
          (col("pos") + 1).as("rank"))
    },

    // ── W1: window rank per group (top-3 orders per customer) ───────────
    "q_window_rank" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.load(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_totalprice"), col("rn"))
    },

    // ── F6-F8 + F9/F10: date-dimension build (gold dim_approach_date).
    // Reference: src/etl/silver_to_gold.py:51-69.
    "q_date_dim" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")
          .as("date_full"))
        .distinct()
        .select(
          sha2(concat_ws("||", col("date_full")), 256).as("sk_date"),
          col("date_full"),
          year(to_timestamp(col("date_full"))).as("year"),
          month(to_timestamp(col("date_full"))).as("month"),
          dayofmonth(to_timestamp(col("date_full"))).as("day"),
          hour(to_timestamp(col("date_full"))).as("hour"),
          minute(to_timestamp(col("date_full"))).as("minute"),
          weekofyear(to_timestamp(col("date_full"))).as("week"))
    },

    // ── F9/F10: sha2 surrogate keys over a dimension (gold dim_asteroid
    // analog). Reference: src/etl/silver_to_gold.py:118-121,131-133.
    "q_sha2_sk" -> { (s, dir) =>
      Tables.load(s, dir, "customer")
        .select(
          sha2(concat_ws("||", col("c_custkey").cast("string")), 256)
            .as("sk_customer"),
          col("c_custkey"), col("c_name"), col("c_mktsegment"))
    },

    // ── rollup: hierarchical subtotals (status → status+priority → all).
    // One shuffle; Expand feeds the same hash aggregate as a flat group.
    "q_rollup_agg" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
    },

    // ── cube: all 2² grouping combinations in ONE shuffle (Expand emits
    // a row per grouping set, the hash aggregate is shared). grouping_id
    // disambiguates subtotal NULLs from data NULLs — the standard cube
    // consumer contract.
    "q_cube_agg" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"),
          grouping_id().as("gid"))
    },

    // ── explicit grouping sets (the non-hierarchical shape rollup/cube
    // can't express): per-status totals and per-priority totals in one
    // pass, via the SQL surface (the DataFrame API has no grouping-sets
    // verb; SQL is the first-class route in both engines).
    "q_grouping_sets" -> { (s, dir) =>
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
          |""".stripMargin)
    },

    // ── ntile/percent_rank: distribution windows (quartile bucketing and
    // relative rank per nation). Keyed by c_nationkey — high enough
    // cardinality to spread; percent_rank's (rank-1)/(n-1) is the same
    // exact integer-ratio IEEE division in both engines.
    "q_window_ntile" -> { (s, dir) =>
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          ntile(4).over(w).as("tile"),
          percent_rank().over(w).as("pr"))
    },

    // ── window lag/lead: per-customer order history deltas ──────────────
    "q_window_lag" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
    },

    // ── left semi join: customers having at least one order. The probe
    // side streams; only the key set shuffles (or broadcasts under AQE).
    "q_semi_join" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
    },

    // ── left anti join: customers with no 1998-or-later order ───────────
    "q_anti_join" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
    },

    // ── pivot: status columns per priority (fixed value list so the
    // plan is a single conditional aggregate — no distinct-values job).
    "q_pivot_status" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(dsum(col("o_totalprice")))
    },

    // ── U2: intersect / except (both DISTINCT set semantics) ────────────
    "q_intersect" -> { (s, dir) =>
      Tables.load(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .intersect(
          Tables.load(s, dir, "supplier").select(col("s_nationkey").as("nk")))
    },

    // customers who ordered, minus those still ordering in 1998+
    "q_except" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      o.select(col("o_custkey").as("ck"))
        .except(o.filter(
            col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
          .select(col("o_custkey").as("ck")))
    },

    // ── U2b: BAG semantics (ALL variants keep multiplicities — the
    // reconciliation shape: "orders per customer beyond their 1998+
    // count" survives as repeated rows, where EXCEPT would collapse to
    // one). Spark lowers both to an aggregate on counts, one shuffle.
    "q_except_all" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      o.select(col("o_custkey").as("ck"))
        .exceptAll(o.filter(
            col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
          .select(col("o_custkey").as("ck")))
    },

    "q_intersect_all" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      o.select(col("o_orderpriority").as("pri"))
        .intersectAll(o.filter(col("o_orderstatus") === "F")
          .select(col("o_orderpriority").as("pri")))
    },

    // ── null-safe equality join (<=>): placeholder-normalized segments
    // where NULL must MATCH NULL (a plain equi-join drops every
    // null-keyed row; IS NOT DISTINCT FROM is the SQL twin). Catalyst
    // still plans a hash join — null-safe keys hash like values.
    "q_nullsafe_join" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"),
          when(col("c_mktsegment") === "BUILDING", lit(null))
            .otherwise(col("c_mktsegment")).as("seg"))
      val segs = c.groupBy(col("seg")).agg(count(lit(1)).as("seg_n"))
      // segs derives from c → alias both sides or the <=> key is an
      // ambiguous self-join reference
      c.as("l").join(segs.as("r"), col("l.seg") <=> col("r.seg"))
        .select(col("c_custkey"), col("r.seg").as("seg"), col("seg_n"))
    },

    // ── string-function family: case/pad/find/slice/reverse ─────────────
    "q_string_ops" -> { (s, dir) =>
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"),
          upper(col("c_name")).as("up"),
          lower(col("c_mktsegment")).as("lo"),
          lpad(col("c_name"), 25, "*").as("padded"),
          instr(col("c_name"), "_").as("underscore_at"),
          substring(col("c_name"), 10, 5).as("mid5"),
          reverse(col("c_name")).as("rev"),
          length(col("c_name")).as("len"))
    },

    // ── date-function family: add/diff/trunc/last_day (integer-exact
    // day arithmetic — no timezone or DST float play at UTC)
    "q_date_math" -> { (s, dir) =>
      val d = to_date(col("o_orderdate"))
      // dates emit as ISO strings: the hash gate reads Spark parquet
      // via pandas (date32 → Timestamp) but DuckDB yields date objects
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          d.cast("string").as("d"),
          date_add(d, 30).cast("string").as("plus30"),
          datediff(lit("2000-01-01").cast("date"), d).as("days_to_y2k"),
          trunc(d, "month").cast("string").as("month_start"),
          last_day(d).cast("string").as("month_end"))
    },

    // ── statistical moments with deterministic arithmetic: mean and
    // population variance derived from DECIMAL-exact Σx and Σx² (order-
    // insensitive), then identical double-precision finishing math in
    // both engines — stddev/corr built-ins would accumulate in floats
    // and drift across partial-agg orderings.
    "q_stats_moments" -> { (s, dir) =>
      val x = col("l_quantity").cast(DecimalType(18, 4))
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(x).cast("double").as("sum_x"),
          sum(x * x).cast("double").as("sum_x2"))
        .select(col("l_returnflag"), col("n"),
          (col("sum_x") / col("n")).as("mean"),
          ((col("sum_x2") - col("sum_x") * col("sum_x") / col("n"))
            / col("n")).as("var_pop"))
    },

    // ── scalar subquery through the SQL surface ────────────────────────
    // Orders priced above the global mean, phrased with SCALAR
    // subqueries so Catalyst's subquery planning (one reused
    // single-row aggregate, not a per-row loop) is the surface under
    // test. Kept division-free: price·n > Σprice ⇔ price > mean, in
    // half-cent-rounded integer cents — exact in both engines.
    "q_scalar_subquery" -> { (s, dir) =>
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders_ssq")
      s.sql("""
        SELECT o_orderkey,
          CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
        FROM orders_ssq
        WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
            * (SELECT count(*) FROM orders_ssq)
          > (SELECT sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             FROM orders_ssq)""")
    },

    // ── sampled integer correlation profile: pairwise corr² (ppm) and
    // sign over (quantity, price, discount) on a deterministic 1 % hash
    // sample. Correlation is a DIAGNOSTIC — estimates converge at tiny
    // sample fractions, so at 100 TB you sample first (hash-stable, so
    // the sample is identical across engines/runs/cluster sizes) and
    // never pay a full scan. ONE aggregate computes all ten sums; each
    // pair is then pure one-row arithmetic in DECIMAL(38,0) — corr² =
    // (nΣxy−ΣxΣy)² / ((nΣx²−(Σx)²)(nΣy²−(Σy)²)) stays division-free
    // until the final integer ppm, so there is no float drift for the
    // hash gate to trip on. Values are quantized: whole quantity,
    // whole-dollar price, discount in percent. Headroom: with q≤51,
    // p<1.31e5, d≤10 the worst product is the (q,p) pair's
    // num²·10⁶ ≤ (n²·6.7e6)²·10⁶, which crosses DECIMAL(38,0)'s 10³⁸
    // ceiling near n≈2.2e4 — Spark nulls an overflowing decimal
    // multiply while DuckDB silently promotes to int128, so past the
    // bound the engines would SPLIT instead of erroring. The sample is
    // therefore size-BOUNDED by construction: after the 1 % hash
    // gate, keep the CORR_MAX_N rows with the smallest second-level
    // hash (deterministic bottom-k — TakeOrdered per-partition heaps,
    // identical across engines/cluster sizes, never a global sort).
    // Estimates converged long before 20 k rows; the raise_error CASE
    // below stays as an in-plan assertion of the invariant.
    "q_correlation" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .filter(Dedup.hash32(CORR_SEED,
          concat_ws("|", col("l_orderkey"), col("l_linenumber")))
          % 100 === 0)
        .withColumn("hk", Dedup.hash32(CORR_SEED + 1,
          concat_ws("|", col("l_orderkey"), col("l_linenumber"))))
        .orderBy(col("hk").asc, col("l_orderkey").asc,
          col("l_linenumber").asc)
        .limit(CORR_MAX_N)
        .select(expr("CAST(floor(l_quantity) AS BIGINT)").as("q"),
          expr("CAST(floor(l_extendedprice) AS BIGINT)").as("p"),
          expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("d"))
      val sums = li.agg(count(lit(1)).as("cnt"),
        sum("q").as("sq"), sum("p").as("sp"), sum("d").as("sd"),
        sum(expr("q*p")).as("sqp"), sum(expr("q*d")).as("sqd"),
        sum(expr("p*d")).as("spd"), sum(expr("q*q")).as("sqq"),
        sum(expr("p*p")).as("spp"), sum(expr("d*d")).as("sdd"))
        .selectExpr(Seq(
          """CASE WHEN cnt <= 20000 THEN cnt ELSE raise_error(
            |  'q_correlation: sample exceeds the proven DECIMAL(38,0)
            | headroom bound (20000 rows) - lower the sample fraction')
            |END AS cnt""".stripMargin) ++
          Seq("sq", "sp", "sd", "sqp", "sqd", "spd", "sqq", "spp", "sdd")
            .map(c => s"CAST($c AS DECIMAL(38,0)) AS $c"): _*)
      val rows = CORR_PAIRS.map { case (nx, ny, sxy, sx, sy, sxx, syy) =>
        val num = s"(cnt*$sxy - $sx*$sy)"
        val den = s"((cnt*$sxx - $sx*$sx) * (cnt*$syy - $sy*$sy))"
        s"""'$nx', '$ny',
           |CASE WHEN $num > 0 THEN CAST(1 AS BIGINT)
           |     WHEN $num < 0 THEN CAST(-1 AS BIGINT)
           |     ELSE CAST(0 AS BIGINT) END,
           |CASE WHEN $den = 0 THEN CAST(NULL AS BIGINT)
           |     ELSE CAST(($num*$num*1000000) div $den AS BIGINT)
           |END""".stripMargin
      }.mkString(",\n")
      sums.selectExpr("CAST(cnt AS BIGINT) AS n",
        s"stack(${CORR_PAIRS.size}, $rows) AS (var_x, var_y, corr_sign, corr2_ppm)")
        .select(col("var_x"), col("var_y"), col("n"),
          col("corr_sign"), col("corr2_ppm"))
    },

    // ── fixed-width histogram: the distribution profile that needs no
    // second pass (bounds are fixed, not min/max-derived), so it stays
    // ONE map-side-combinable aggregation. floor of a double division
    // is correctly rounded IEEE in both engines → bin ids are
    // oracle-exact.
    "q_histogram" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(floor(col("o_totalprice") / 50000d).cast("long").as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"))
        .select(col("bin"), (col("bin") * 50000).cast("double").as("lo"),
          col("n"))
    },

    // ── unpivot/melt: wide measures → long (measure, value) ────────────
    // The wide-to-long reshape (Spark's native unpivot — a Generate,
    // zero shuffle) audited with one decimal-exact aggregate per
    // measure. The oracle states it as the portable UNION ALL.
    "q_unpivot" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value")
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
    },

    // ── mode (most frequent value) per group, deterministic tiebreak ────
    // Two keyed aggregations — (group, value) counts then a struct-min
    // argmax (count desc, value asc) — both map-side combinable; the
    // window form would funnel each group into one task.
    "q_mode" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("l_returnflag"))
        .agg(min(struct((-col("c")).as("nc"),
          col("l_quantity").as("v"), col("c").as("c"))).as("best"))
        .select(col("l_returnflag"), col("best.v").as("mode_qty"),
          col("best.c").as("n_mode"))
    },

    // ── grain-bucketed RANGE join, oracle-checked: shipments landing in
    // the 4-day window after each order date. The naive inequality join
    // (no equi conjunct) is a BroadcastNestedLoopJoin — O(n·m); the
    // grain form explodes each lineitem's 4-day window into day grains
    // and hash-joins on grain equality (see [[RangeJoin]] for the
    // row-level operator; PlanShapeSpec pins no nested-loop/cartesian
    // and row-identity with the declarative BETWEEN plan).
    //
    // Because this query only COUNTS matches, the aggregate is pushed
    // BELOW the join: each (order, lineitem) match meets on exactly one
    // grain — the order's own date — so count-per-order ≡ the exploded
    // side's count at that grain. The join input collapses from
    // |lineitem|·span rows to |distinct dates| rows, and the 150M-row
    // join-then-aggregate becomes a broadcast lookup (16.5 s → sub-
    // second at sf0.1). Row-level consumers use
    // [[RangeJoin.joinPointInInterval]]; counting consumers should
    // always pre-aggregate like this.
    "q_range_join_grain" -> { (s, dir) =>
      val grainCounts = Tables.load(s, dir, "lineitem")
        .select(explode(sequence(
          date_sub(to_date(col("l_shipdate")), 3),
          to_date(col("l_shipdate")))).as("grain"))
        .groupBy(col("grain"))
        .agg(count(lit(1)).as("n_shipments_4d"))
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("grain"))
        .join(grainCounts, "grain")
        .select(col("o_orderkey"), col("n_shipments_4d"))
    },

    // ── interval-interval overlap join on a shared equi-key ────────────
    // The OTHER range-join shape ([[RangeJoin]] covers point-in-
    // interval): find same-customer order windows ([o_orderdate,
    // +7 days]) that overlap. The customer key carries the join — one
    // hash shuffle per side, never a BNLJ — and the overlap predicate
    // is a residual filter inside each key group, whose size the key's
    // cardinality bounds. When no natural equi-key exists, grain-
    // bucketing the interval (RangeJoin) is the fallback; with one, this
    // is the plan you want at any scale. Overlap length in whole days.
    "q_interval_overlap" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          to_date(col("o_orderdate")).as("d"))
        .withColumn("end_d", date_add(col("d"), OVERLAP_SPAN_DAYS))
      val a = o.as("a")
      val b = o.as("b")
      a.join(b, col("a.o_custkey") === col("b.o_custkey") &&
          col("a.o_orderkey") < col("b.o_orderkey") &&
          col("a.d") <= col("b.end_d") && col("b.d") <= col("a.end_d"))
        .select(col("a.o_custkey").as("custkey"),
          col("a.o_orderkey").as("order_a"),
          col("b.o_orderkey").as("order_b"),
          (datediff(least(col("a.end_d"), col("b.end_d")),
            greatest(col("a.d"), col("b.d"))) + 1).cast("long")
            .as("overlap_days"))
    },

    // ── explicit salted skew join, oracle-checked: the salt only changes
    // the PHYSICAL shuffle (hot keys spread over `salt` reducers); the
    // logical result is row-identical to the plain inner join, which is
    // exactly what the DuckDB oracle computes. The post-join aggregate
    // makes the compare deterministic.
    "q_salted_join" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val ord = Tables.load(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      SkewJoin.saltedInnerJoin(li, ord, Seq("l_orderkey"), salt = 8)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
            .as("sum_qty"))
    },

    // ── bucketed co-located join, oracle-checked: both sides written
    // bucketed+sorted on the join key (the shuffle paid ONCE at write
    // time), then joined exchange-free (BucketingSpec pins the plan has
    // no hashpartitioning on either side). Logical result ≡ the plain
    // join, which is the DuckDB oracle. The writes go through
    // ensureBucketed — the layout-tagged skip — so only the FIRST run
    // over a given source pays them: that is the operator's production
    // shape (write once, join forever), and it is what the bench's
    // median-of-reps records.
    "q_bucketed_join" -> { (s, dir) =>
      // the tag carries a file-metadata signature of the source, not
      // just its path: an in-place refresh of the parquet invalidates
      // the bucketed copy instead of silently joining stale rows
      Bucketing.ensureBucketed(
        Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice")),
        "graft_bkt_lineitem", "l_orderkey", 8,
        tag = dir + "|" +
          Bucketing.sourceSignature(s, s"$dir/lineitem.parquet"))
      Bucketing.ensureBucketed(
        Tables.load(s, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
        "graft_bkt_orders", "l_orderkey", 8,
        tag = dir + "|" +
          Bucketing.sourceSignature(s, s"$dir/orders.parquet"))
      Bucketing.bucketedJoin(s, "graft_bkt_lineitem", "graft_bkt_orders",
          "l_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast("double").as("sum_price"))
    },

    // ── S7: SQL serving surface — the same TPC-H Q3-flavor plan Catalyst
    // builds from the DataFrame API, but authored as spark.sql text over
    // temp views (the reference serves gold via SQL; streamlit_app.py:35-53).
    "q_sql_serving" -> { (s, dir) =>
      Seq("customer", "orders", "lineitem")
        .foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
      s.sql("""
        SELECT l_orderkey, o_orderdate,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
            * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10""")
    },

    // ── Z-order layout clustering for two-dimensional file skipping ────
    // See [[ZOrder]]: bucket = high bits of the Morton interleave of
    // (l_partkey, l_suppkey) — fixed-width z-ranges, ONE hash aggregate,
    // no global sort — reporting per-bucket min/max of BOTH dims (the
    // footer stats a pruning scan consults). ZOrderSpec asserts the
    // skipping win vs a single-dim layout.
    // shift=10 fixes z-bits ≥10 per bucket ⇒ each bucket is a 32×32
    // axis-aligned cell of (partkey, suppkey) space — BOTH dims get
    // tight per-bucket min/max (partkey spans 2000, suppkey 100 here;
    // a larger shift would leave the narrow dim unconstrained).
    "q_zorder_layout" -> { (s, dir) =>
      ZOrder.spanByBucket(Tables.load(s, dir, "lineitem"),
        col("l_partkey"), col("l_suppkey"), shift = ZOrder.LAYOUT_SHIFT)
    },

    // ── Deequ-style one-pass data-quality verdicts ─────────────────────
    // See [[DataQuality]]: fused conditional aggregates per table + one
    // LeftAnti referential check → (rule, metric_bp, pass).
    "q_dq_checks" -> { (s, dir) => DataQuality.checks(s, dir) }
    ,

    // ── revenue concentration (top-decile customer share) ──────────────
    // The 80/20 readout: what share of total order value sits with the
    // customers at or above the p90 total-spend cutoff. "≥ cutoff" is
    // the whole-tie-group contract, so no partial-group arithmetic and
    // both engines pick the same set. Money sums ride half-cent-rounded
    // integer cents.
    //
    // The cutoff needs a GLOBAL cumulative count over distinct spend
    // totals walking DESC — and distinct totals ≈ #customers at scale,
    // so `Window.orderBy(tot.desc)` (a single-partition sort) is the
    // one shape this query must never take. Instead: the distributed
    // prefix-sum. repartitionByRange(tot DESC) range-partitions the
    // value-grouped table (sampling-based, scales like any sort), each
    // partition cumulates LOCALLY under a pid-partitioned window (fully
    // parallel), and the per-partition subtotal table (≤ shuffle-
    // partitions rows) self-joins into prefix offsets that broadcast
    // back. local_cum + offset(pid) = the exact global cumulative count
    // — no window anywhere in the plan sees more than one partition's
    // rows (PlanShapeSpec pins the shape).
    "q_revenue_concentration" -> { (s, dir) =>
      val per = Tables.load(s, dir, "orders")
        .select(col("o_custkey"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("cents"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("cents")).as("tot"))
      val nParts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val byVal = per.groupBy(col("tot")).agg(count(lit(1)).as("c"))
        .repartitionByRange(nParts, col("tot").desc)
        .withColumn("pid", spark_partition_id())
      // per-partition subtotals: ≤ nParts rows by construction; the
      // triangular self-join (b.pid < a.pid) replaces even the tiny
      // ordered window so the WHOLE plan is window-free below bounded
      // inputs — offset(pid) = Σ counts of all strictly-higher-value
      // partitions (range partitions are ordered tot DESC ⇒ lower pid
      // = larger totals)
      val pidTotals = byVal.groupBy(col("pid"))
        .agg(sum(col("c")).as("pc"))
      val offsets = pidTotals.as("a")
        .join(pidTotals.as("b"), col("b.pid") < col("a.pid"), "left")
        .groupBy(col("a.pid").as("pid"))
        .agg(coalesce(sum(col("b.pc")), lit(0L)).as("offset"))
      val wLocal = Window.partitionBy(col("pid"))
        .orderBy(col("tot").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cut = byVal
        .withColumn("local_cum", sum(col("c")).over(wLocal))
        .join(broadcast(offsets), Seq("pid"))
        .withColumn("cum", col("local_cum") + col("offset"))
        .crossJoin(broadcast(per.agg(count(lit(1)).as("n"))))
        .agg(max(col("n")).as("n_customers"),
          // first crossing walking DESC = the LARGEST total whose
          // cumulative count reaches n/10 (all smaller totals also
          // satisfy the predicate, so max — not min — is the cutoff)
          max(when(col("cum") * 10 >= col("n"), col("tot")))
            .as("cutoff_cents"))
      per.crossJoin(broadcast(cut))
        .agg(max(col("n_customers")).as("n_customers"),
          max(col("cutoff_cents")).as("cutoff_cents"),
          sum(when(col("tot") >= col("cutoff_cents"), 1L)
            .otherwise(0L)).as("n_top"),
          sum(col("tot")).as("total_cents"),
          sum(when(col("tot") >= col("cutoff_cents"), col("tot"))
            .otherwise(0L)).as("top_cents"))
        .withColumn("top_share_bp",
          expr("top_cents * 10000 div total_cents"))
    },

    // ── EXACT percentiles over an UNBOUNDED value domain ────────────────
    // q_quantiles' bounded-window rule needs the distinct-value table to
    // be small; order totals break it (distinct cents ≈ |orders| at any
    // scale). Same cure as q_revenue_concentration: range-partition the
    // value census ASC, cumulate locally under pid-partitioned windows,
    // lift to the global cumulative count with broadcast per-partition
    // offsets — the distributed prefix-sum — then read each percentile
    // as the smallest value whose global cum crosses ⌈p·n/100⌉ (integer
    // cross-multiplication: 100·cum ≥ p·n). Exact quantile_disc
    // semantics with NO single-partition sort at ANY value cardinality;
    // PlanShapeSpec pins the window shape.
    "q_quantiles_unbounded" -> { (s, dir) =>
      val per = Tables.load(s, dir, "orders")
        .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
          .as("cents"))
      val nParts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val byVal = per.groupBy(col("cents")).agg(count(lit(1)).as("c"))
        .repartitionByRange(nParts, col("cents").asc)
        .withColumn("pid", spark_partition_id())
      val pidTotals = byVal.groupBy(col("pid"))
        .agg(sum(col("c")).as("pc"))
      val offsets = pidTotals.as("a")
        .join(pidTotals.as("b"), col("b.pid") < col("a.pid"), "left")
        .groupBy(col("a.pid").as("pid"))
        .agg(coalesce(sum(col("b.pc")), lit(0L)).as("offset"))
      val wLocal = Window.partitionBy(col("pid"))
        .orderBy(col("cents").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val nRow = per.agg(count(lit(1)).as("n"))
      byVal
        .withColumn("local_cum", sum(col("c")).over(wLocal))
        .join(broadcast(offsets), Seq("pid"))
        .withColumn("cum", col("local_cum") + col("offset"))
        .crossJoin(broadcast(nRow))
        .agg(max(col("n")).as("n_orders"),
          min(when(col("cum") * 100 >= col("n") * 50, col("cents")))
            .as("p50_cents"),
          min(when(col("cum") * 100 >= col("n") * 95, col("cents")))
            .as("p95_cents"),
          min(when(col("cum") * 100 >= col("n") * 99, col("cents")))
            .as("p99_cents"),
          max(col("cents")).as("max_cents"))
    },

    // ── OLS trend of daily order volume (slope as exact rational) ──────
    // The trend-detection primitive q_correlation's corr² can't give
    // (corr² is sign-blind): the least-squares slope of count-per-day
    // over the day index, emitted as the exact integer rational
    // (n·Σdc − Σd·Σc) / (n·Σd² − (Σd)²) instead of a float. Emitting
    // num/den dodges the one cross-engine division hazard: Spark's
    // `div` truncates toward zero while DuckDB's `//` floors, and a
    // declining corpus makes the numerator NEGATIVE — so no division
    // happens at all and the hash gate stays exact. Headroom: day ≈
    // 10⁴, so n·Σd² ≈ n²·10⁸ crosses 2⁶³ only past n ≈ 10⁵ days (270
    // years of data) — safe at any SF.
    //
    // 100 TB posture: one map-side-combined aggregate to a day-keyed
    // table (≤ a few thousand rows at any scale), then a single-row
    // total — no window, no join, nothing driver-side.
    "q_ols_trend" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("day")).as("sd"), sum(col("c")).as("sc"),
          sum(col("day") * col("c")).as("sdc"),
          sum(col("day") * col("day")).as("sdd"))
        .select(col("n_days"),
          (col("n_days") * col("sdc") - col("sd") * col("sc"))
            .as("slope_num"),
          (col("n_days") * col("sdd") - col("sd") * col("sd"))
            .as("slope_den"))
    },

    // ── shipping-calendar continuity audit (gap detection) ─────────────
    // The time-series completeness check every ingest monitor needs:
    // per supplier, how continuous is the shipping calendar — active
    // days vs span, missing days, and the LONGEST dark streak (the
    // number an alert thresholds on; totals can't see whether 30
    // missing days are scattered or one outage). One distinct
    // (supplier, day) projection, a supplier-keyed lag window over each
    // supplier's OWN active days (bounded per partition by its
    // calendar, never corpus-wide), one supplier-keyed rollup — all
    // integer epoch-day arithmetic.
    "q_date_gaps" -> { (s, dir) =>
      val days = Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey"),
          datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
            .cast("long").as("day"))
        .distinct()
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("day").asc)
      days
        .withColumn("gap", col("day") - lag(col("day"), 1).over(w) - 1)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_active_days"),
          (max(col("day")) - min(col("day")) + 1).as("span_days"),
          coalesce(max(col("gap")), lit(0L)).as("max_gap_days"))
        .withColumn("n_missing_days",
          expr("span_days - n_active_days"))
    },

    // ── window frame boundary functions (first/last/nth parity) ────────
    // Completes the window family (rank/lag/ntile/rows/range frames)
    // with the frame-boundary readers: per supplier, the FIRST, SECOND
    // and LAST shipped quantities under a fully-keyed deterministic
    // order (day, orderkey, linenumber) over the unbounded frame —
    // "how did this segment start vs where is it now" without a
    // self-join to the extremes. One supplier-keyed window, one row
    // kept per partition; all integers.
    "q_window_firstlast" -> { (s, dir) =>
      val base = Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey"),
          datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
            .cast("long").as("day"),
          col("l_orderkey"), col("l_linenumber"),
          expr("CAST(l_quantity AS BIGINT)").as("qty"))
      val ord = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("day").asc, col("l_orderkey").asc,
          col("l_linenumber").asc)
      val frame = ord.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      base
        .withColumn("first_qty", first(col("qty")).over(frame))
        .withColumn("second_qty",
          nth_value(col("qty"), 2).over(frame))
        .withColumn("last_qty", last(col("qty")).over(frame))
        .withColumn("rn", row_number().over(ord))
        .filter(col("rn") === 1)
        .select(col("l_suppkey"), col("first_qty"), col("second_qty"),
          col("last_qty"))
    },

    // ── per-segment OLS trend (slope per supplier, exact rationals) ────
    // The segment-level form of q_ols_trend — "which suppliers are
    // ramping, which are fading" — and the shape that actually scales:
    // per-key (n, Σd, Σc, Σdc, Σd²) sums are map-side combinable, so
    // the whole query is ONE supplier-keyed aggregate; no windows, no
    // joins, and the slope stays the integer rational num/den (signs
    // preserved, no engine division). Suppliers with < 2 active days
    // are dropped (slope undefined: den = 0).
    "q_trend_by_segment" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey"),
          datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
            .cast("long").as("day"))
        .groupBy(col("l_suppkey"), col("day"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("day")).as("sd"), sum(col("c")).as("sc"),
          sum(col("day") * col("c")).as("sdc"),
          sum(col("day") * col("day")).as("sdd"))
        .filter(col("n_days") >= 2)
        .select(col("l_suppkey"), col("n_days"), col("sc").as("n_items"),
          (col("n_days") * col("sdc") - col("sd") * col("sc"))
            .as("slope_num"),
          (col("n_days") * col("sdd") - col("sd") * col("sd"))
            .as("slope_den"))
    },

    // ── CUSUM change-point of daily order volume ───────────────────────
    // WHEN did the level shift — the question q_ols_trend's single
    // slope and q_dist_drift's aggregate distance can't answer. The
    // classic CUSUM estimator: cumulative deviation from the global
    // mean peaks AT the change point. Kept exact by scaling instead of
    // dividing — cusum_d = Σ_{i≤d} (c_i·n − total) is the mean-centered
    // prefix sum times n, same argmax — so there is no float and no
    // floor anywhere; the peak picks (|cusum| DESC, day ASC) via one
    // struct-min fold, never a sort of the full series.
    //
    // 100 TB posture: one map-combined day aggregate; the prefix-sum
    // window runs over the |days|-row table (bounded: ≤ a few thousand
    // rows at any corpus size), then a single-row fold.
    "q_cusum_changepoint" -> { (s, dir) =>
      val daily = Tables.load(s, dir, "orders")
        .select(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
      val tot = daily.agg(sum(col("c")).as("total"),
        count(lit(1)).as("n_days"))
      val w = Window.orderBy(col("day").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.crossJoin(broadcast(tot))
        .withColumn("cusum",
          sum(col("c") * col("n_days") - col("total")).over(w))
        .agg(max(col("n_days")).as("n_days"),
          max(col("total")).as("total_orders"),
          min(struct((-abs(col("cusum"))).as("na"), col("day"),
            col("cusum"))).as("m"))
        .select(col("n_days"), col("total_orders"),
          col("m.day").as("cp_day"), col("m.cusum").as("cusum_peak"))
    },

    // ── HITS hubs/authorities on the customer↔part purchase graph ──────
    // [[Clusters.hits]] over the bipartite who-bought-what edge list
    // (orders ⋈ lineitem, deduped): authorities = parts endorsed by
    // broad buyers, hubs = customers whose baskets concentrate on
    // endorsed parts — the mutual-reinforcement readout PageRank's
    // single score conflates. Integer L∞-normalized rounds; the oracle
    // unrolls the identical iterations as chained CTEs.
    //
    // 100 TB posture: edge dedup + per-round node-keyed sums are the
    // only corpus-scale shuffles; normalization attaches a broadcast
    // one-row max; hub state parquet-round-trips per round (bounded
    // lineage, [[Clusters.pageRank]] contract).
    "q_hits_scores" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      Clusters.hits(
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .select(col("o_custkey").as("c"), col("l_partkey").as("p")),
        "c", "p", HITS_ITERS)
    }
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | count(*) AS count_order,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_project_cast" ->
      """SELECT CAST(l_orderkey AS BIGINT) AS orderkey,
        | CAST(l_linenumber AS INT) AS linenumber,
        | CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        | CAST(l_returnflag AS VARCHAR) AS returnflag,
        | CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM lineitem""".stripMargin,

    "q_normalize_casewhen" ->
      """SELECT c_custkey,
        | CASE WHEN trim(c_name) IN ('NULL','Null','') THEN NULL ELSE trim(c_name) END AS c_name,
        | c_nationkey, c_acctbal,
        | CASE WHEN trim(c_mktsegment) IN ('NULL','Null','') THEN NULL ELSE trim(c_mktsegment) END AS c_mktsegment
        |FROM customer""".stripMargin,

    "q_profile_onepass" ->
      """SELECT count(*) AS n_rows,
        | count(CASE WHEN o_custkey IS NULL THEN 1 END) AS nulls_custkey,
        | count(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS nulls_status,
        | count(DISTINCT o_orderstatus) AS distinct_status,
        | count(DISTINCT o_orderpriority) AS distinct_priority
        |FROM orders""".stripMargin,

    "q_distinct" ->
      "SELECT DISTINCT o_orderpriority FROM orders",

    "q_dedup_exact" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "q_dedup_keyed" ->
      """SELECT l_orderkey, l_linenumber, l_partkey
        |FROM (SELECT l_orderkey, l_linenumber, l_partkey,
        |  row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber ASC, l_partkey ASC) AS rn
        |  FROM lineitem) WHERE rn = 1""".stripMargin,

    "q_merge_upsert" ->
      """WITH existing AS (
        |  SELECT *, 2 AS src_rank FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
        |), incoming AS (
        |  SELECT *, 1 AS src_rank FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |), unioned AS (
        |  SELECT * FROM incoming UNION ALL SELECT * FROM existing
        |)
        |SELECT o_orderkey, o_orderstatus, o_totalprice, src_rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY src_rank ASC) AS rn
        |      FROM unioned) WHERE rn = 1""".stripMargin,

    "q_union_by_name" ->
      """SELECT s_suppkey AS key, s_name AS name, s_acctbal AS acctbal, NULL AS segment FROM supplier
        |UNION ALL
        |SELECT c_custkey AS key, c_name AS name, NULL AS acctbal, c_mktsegment AS segment FROM customer""".stripMargin,

    "q_star_join" ->
      """SELECT n_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q_trailing_sum" ->
      """WITH daily AS (SELECT l_suppkey,
        |    date_diff('day', DATE '1970-01-01', l_shipdate) AS day,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS day_qty
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_suppkey, day, day_qty,
        |  CAST(sum(day_qty) OVER (PARTITION BY l_suppkey ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS qty_7d
        |FROM daily""".stripMargin,

    "q_group_topk" ->
      """WITH li AS (SELECT l_suppkey,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_cents,
        |    l_orderkey * 100 + l_linenumber AS item_id FROM lineitem),
        |r AS (SELECT l_suppkey, item_id, price_cents,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY price_cents DESC, item_id ASC) AS rank
        |  FROM li)
        |SELECT l_suppkey, item_id, price_cents, rank FROM r
        |WHERE rank <= 3""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |   row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,

    "q_date_dim" ->
      """WITH d AS (SELECT DISTINCT strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS date_full FROM orders)
        |SELECT sha256(date_full) AS sk_date, date_full,
        | year(CAST(date_full AS TIMESTAMP)) AS year,
        | month(CAST(date_full AS TIMESTAMP)) AS month,
        | dayofmonth(CAST(date_full AS TIMESTAMP)) AS day,
        | hour(CAST(date_full AS TIMESTAMP)) AS hour,
        | minute(CAST(date_full AS TIMESTAMP)) AS minute,
        | weekofyear(CAST(date_full AS TIMESTAMP)) AS week
        |FROM d""".stripMargin,

    "q_sha2_sk" ->
      """SELECT sha256(CAST(c_custkey AS VARCHAR)) AS sk_customer,
        | c_custkey, c_name, c_mktsegment
        |FROM customer""".stripMargin,

    "q_rollup_agg" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,

    "q_cube_agg" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        | CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin,

    "q_window_ntile" ->
      """SELECT c_custkey, c_nationkey,
        | ntile(4) OVER w AS tile,
        | percent_rank() OVER w AS pr
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey
        |             ORDER BY c_acctbal DESC, c_custkey ASC)""".stripMargin,

    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | lag(o_totalprice, 1) OVER w AS prev_price,
        | lead(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1998-01-01')""".stripMargin,

    "q_pivot_status" ->
      """SELECT o_orderpriority,
        | CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "O",
        | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
        | CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "P"
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier""".stripMargin,

    "q_except" ->
      """SELECT o_custkey AS ck FROM orders
        |EXCEPT
        |SELECT o_custkey AS ck FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01'""".stripMargin,

    "q_except_all" ->
      """SELECT o_custkey AS ck FROM orders
        |EXCEPT ALL
        |SELECT o_custkey AS ck FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01'""".stripMargin,

    "q_intersect_all" ->
      """SELECT o_orderpriority AS pri FROM orders
        |INTERSECT ALL
        |SELECT o_orderpriority AS pri FROM orders
        |WHERE o_orderstatus = 'F'""".stripMargin,

    "q_nullsafe_join" ->
      """WITH c AS (SELECT c_custkey,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN NULL
        |         ELSE c_mktsegment END AS seg
        |  FROM customer),
        |segs AS (SELECT seg, count(*) AS seg_n FROM c GROUP BY seg)
        |SELECT c.c_custkey, segs.seg, seg_n
        |FROM c JOIN segs ON c.seg IS NOT DISTINCT FROM segs.seg""".stripMargin,

    "q_string_ops" ->
      """SELECT c_custkey,
        | upper(c_name) AS up,
        | lower(c_mktsegment) AS lo,
        | lpad(c_name, 25, '*') AS padded,
        | strpos(c_name, '_') AS underscore_at,
        | substr(c_name, 10, 5) AS mid5,
        | reverse(c_name) AS rev,
        | length(c_name) AS len
        |FROM customer""".stripMargin,

    "q_date_math" ->
      """SELECT o_orderkey,
        | CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d,
        | CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS plus30,
        | date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
        | CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
        | CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
        |FROM orders""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT o_orderkey,
        |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
        |FROM orders
        |WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |    * (SELECT count(*) FROM orders)
        |  > (SELECT CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
        |        AS BIGINT)) AS BIGINT) FROM orders)""".stripMargin,

    "q_correlation" -> {
      val pairSelects = CORR_PAIRS.map {
        case (nx, ny, sxy, sx, sy, sxx, syy) =>
          val num = s"(cnt*$sxy - $sx*$sy)"
          val den = s"((cnt*$sxx - $sx*$sx) * (cnt*$syy - $sy*$sy))"
          s"""SELECT '$nx' AS var_x, '$ny' AS var_y,
             |  CAST(cnt AS BIGINT) AS n,
             |  CASE WHEN $num > 0 THEN CAST(1 AS BIGINT)
             |       WHEN $num < 0 THEN CAST(-1 AS BIGINT)
             |       ELSE CAST(0 AS BIGINT) END AS corr_sign,
             |  CASE WHEN $den = 0 THEN CAST(NULL AS BIGINT)
             |       ELSE CAST(($num*$num*1000000) // $den AS BIGINT)
             |  END AS corr2_ppm
             |FROM s""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH li0 AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS q,
         |    CAST(floor(l_extendedprice) AS BIGINT) AS p,
         |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
         |    ${Dedup.hash32Sql(CORR_SEED + 1,
             "concat_ws('|', l_orderkey, l_linenumber)")} AS hk,
         |    l_orderkey, l_linenumber
         |  FROM lineitem
         |  WHERE ${Dedup.hash32Sql(CORR_SEED,
             "concat_ws('|', l_orderkey, l_linenumber)")} % 100 = 0),
         |li AS (SELECT q, p, d FROM li0
         |  ORDER BY hk, l_orderkey, l_linenumber LIMIT $CORR_MAX_N),
         |s AS (SELECT count(*) AS cnt, sum(q) AS sq, sum(p) AS sp,
         |    sum(d) AS sd, sum(q*p) AS sqp, sum(q*d) AS sqd,
         |    sum(p*d) AS spd, sum(q*q) AS sqq, sum(p*p) AS spp,
         |    sum(d*d) AS sdd
         |  FROM li)
         |$pairSelects""".stripMargin
    },

    "q_stats_moments" ->
      """WITH s AS (SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_x,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))
        |    * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_x2
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n, sum_x / n AS mean,
        | (sum_x2 - sum_x * sum_x / n) / n AS var_pop
        |FROM s""".stripMargin,

    "q_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "q_interval_overlap" ->
      s"""WITH o AS (SELECT o_orderkey, o_custkey,
         |    CAST(o_orderdate AS DATE) AS d,
         |    CAST(o_orderdate AS DATE) + $OVERLAP_SPAN_DAYS AS end_d
         |  FROM orders)
         |SELECT a.o_custkey AS custkey, a.o_orderkey AS order_a,
         |  b.o_orderkey AS order_b,
         |  CAST(date_diff('day', greatest(a.d, b.d),
         |    least(a.end_d, b.end_d)) + 1 AS BIGINT) AS overlap_days
         |FROM o a JOIN o b
         |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
         | AND a.d <= b.end_d AND b.d <= a.end_d""".stripMargin,

    "q_salted_join" ->
      """SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin,

    "q_histogram" ->
      """WITH b AS (SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT)
        |    AS bin FROM orders)
        |SELECT bin, CAST(bin * 50000 AS DOUBLE) AS lo, count(*) AS n
        |FROM b GROUP BY bin""".stripMargin,

    "q_unpivot" ->
      """WITH m AS (
        |  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT measure, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM m GROUP BY measure""".stripMargin,

    "q_mode" ->
      """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT l_returnflag, l_quantity, c,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY c DESC, l_quantity ASC) AS rn
        |  FROM c)
        |SELECT l_returnflag, l_quantity AS mode_qty, c AS n_mode
        |FROM r WHERE rn = 1""".stripMargin,

    // the oracle states the range join DECLARATIVELY (plain BETWEEN) —
    // the grain rewrite must be semantics-preserving
    "q_range_join_grain" ->
      """SELECT o_orderkey, count(*) AS n_shipments_4d
        |FROM orders JOIN lineitem
        |  ON CAST(l_shipdate AS DATE) >= CAST(o_orderdate AS DATE)
        | AND CAST(l_shipdate AS DATE) <= CAST(o_orderdate AS DATE) + 3
        |GROUP BY o_orderkey""".stripMargin,

    "q_sql_serving" ->
      """SELECT l_orderkey, o_orderdate,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q_zorder_layout" ->
      s"""WITH z AS (SELECT l_partkey AS x, l_suppkey AS y,
         |    ${ZOrder.zValueSql("l_partkey", "l_suppkey")}
         |    >> ${ZOrder.LAYOUT_SHIFT} AS zbucket
         |  FROM lineitem)
         |SELECT zbucket, count(*) AS n_rows,
         |  min(x) AS x_min, max(x) AS x_max,
         |  min(y) AS y_min, max(y) AS y_max
         |FROM z GROUP BY zbucket""".stripMargin,

    "q_dq_checks" -> DataQuality.checksSql,

    "q_quantiles_unbounded" ->
      """WITH per AS (SELECT CAST(floor(o_totalprice * 100 + 0.5)
        |    AS BIGINT) AS cents FROM orders),
        |bv AS (SELECT cents, count(*) AS c FROM per GROUP BY 1),
        |cm AS (SELECT cents, CAST(sum(c) OVER (ORDER BY cents
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM bv),
        |n AS (SELECT count(*) AS n FROM per)
        |SELECT CAST(max(n.n) AS BIGINT) AS n_orders,
        |  min(CASE WHEN cum * 100 >= n.n * 50 THEN cents END)
        |    AS p50_cents,
        |  min(CASE WHEN cum * 100 >= n.n * 95 THEN cents END)
        |    AS p95_cents,
        |  min(CASE WHEN cum * 100 >= n.n * 99 THEN cents END)
        |    AS p99_cents,
        |  max(cents) AS max_cents
        |FROM cm, n""".stripMargin,

    "q_revenue_concentration" ->
      """WITH per AS (SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS tot
        |  FROM orders GROUP BY 1),
        |bv AS (SELECT tot, count(*) AS c FROM per GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM per),
        |cm AS (SELECT tot, c,
        |    CAST(sum(c) OVER (ORDER BY tot DESC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM bv),
        |ct AS (SELECT max(n) AS n_customers,
        |    max(CASE WHEN cum * 10 >= n THEN tot END) AS cutoff_cents
        |  FROM cm, nn)
        |SELECT max(n_customers) AS n_customers,
        |  max(cutoff_cents) AS cutoff_cents,
        |  CAST(sum(CASE WHEN tot >= cutoff_cents THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_top,
        |  CAST(sum(tot) AS BIGINT) AS total_cents,
        |  CAST(sum(CASE WHEN tot >= cutoff_cents THEN tot ELSE 0 END)
        |    AS BIGINT) AS top_cents,
        |  CAST(sum(CASE WHEN tot >= cutoff_cents THEN tot ELSE 0 END)
        |    * 10000 // sum(tot) AS BIGINT) AS top_share_bp
        |FROM per, ct""".stripMargin,

    "q_ols_trend" ->
      """WITH od AS (SELECT date_diff('day', DATE '1970-01-01',
        |    o_orderdate) AS day FROM orders),
        |odc AS (SELECT day, count(*) AS c FROM od GROUP BY 1),
        |osm AS (SELECT count(*) AS n_days,
        |    CAST(sum(day) AS BIGINT) AS sd,
        |    CAST(sum(c) AS BIGINT) AS sc,
        |    CAST(sum(day * c) AS BIGINT) AS sdc,
        |    CAST(sum(day * day) AS BIGINT) AS sdd
        |  FROM odc)
        |SELECT CAST(n_days AS BIGINT) AS n_days,
        |  CAST(n_days * sdc - sd * sc AS BIGINT) AS slope_num,
        |  CAST(n_days * sdd - sd * sd AS BIGINT) AS slope_den
        |FROM osm""".stripMargin,

    "q_date_gaps" ->
      """WITH gd AS (SELECT DISTINCT l_suppkey,
        |    date_diff('day', DATE '1970-01-01', l_shipdate) AS day
        |  FROM lineitem),
        |gg AS (SELECT l_suppkey, day,
        |    day - lag(day) OVER (PARTITION BY l_suppkey
        |      ORDER BY day ASC) - 1 AS gap
        |  FROM gd)
        |SELECT l_suppkey, count(*) AS n_active_days,
        |  CAST(max(day) - min(day) + 1 AS BIGINT) AS span_days,
        |  CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap_days,
        |  CAST(max(day) - min(day) + 1 - count(*) AS BIGINT)
        |    AS n_missing_days
        |FROM gg GROUP BY 1""".stripMargin,

    "q_window_firstlast" ->
      """WITH wfb AS (SELECT l_suppkey,
        |    date_diff('day', DATE '1970-01-01', l_shipdate) AS day,
        |    l_orderkey, l_linenumber,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem),
        |wfw AS (SELECT l_suppkey,
        |    first_value(qty) OVER w AS first_qty,
        |    nth_value(qty, 2) OVER w AS second_qty,
        |    last_value(qty) OVER w AS last_qty,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY day ASC, l_orderkey ASC, l_linenumber ASC) AS rn
        |  FROM wfb WINDOW w AS (PARTITION BY l_suppkey
        |    ORDER BY day ASC, l_orderkey ASC, l_linenumber ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT l_suppkey, first_qty, second_qty, last_qty
        |FROM wfw WHERE rn = 1""".stripMargin,

    "q_trend_by_segment" ->
      """WITH tsd AS (SELECT l_suppkey,
        |    date_diff('day', DATE '1970-01-01', l_shipdate) AS day
        |  FROM lineitem),
        |tsc AS (SELECT l_suppkey, day, count(*) AS c
        |  FROM tsd GROUP BY 1, 2),
        |tss AS (SELECT l_suppkey, count(*) AS n_days,
        |    CAST(sum(day) AS BIGINT) AS sd,
        |    CAST(sum(c) AS BIGINT) AS sc,
        |    CAST(sum(day * c) AS BIGINT) AS sdc,
        |    CAST(sum(day * day) AS BIGINT) AS sdd
        |  FROM tsc GROUP BY 1)
        |SELECT l_suppkey, n_days, sc AS n_items,
        |  CAST(n_days * sdc - sd * sc AS BIGINT) AS slope_num,
        |  CAST(n_days * sdd - sd * sd AS BIGINT) AS slope_den
        |FROM tss WHERE n_days >= 2""".stripMargin,

    "q_cusum_changepoint" ->
      """WITH ccd AS (SELECT date_diff('day', DATE '1970-01-01',
        |    o_orderdate) AS day FROM orders),
        |ccc AS (SELECT day, count(*) AS c FROM ccd GROUP BY 1),
        |cct AS (SELECT CAST(sum(c) AS BIGINT) AS total,
        |    count(*) AS n_days FROM ccc),
        |ccs AS (SELECT day, CAST(sum(c * n_days - total) OVER (
        |    ORDER BY day ASC ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS cusum
        |  FROM ccc CROSS JOIN cct),
        |ccp AS (SELECT day, cusum, row_number() OVER (
        |    ORDER BY abs(cusum) DESC, day ASC) AS rn FROM ccs)
        |SELECT n_days, total AS total_orders, day AS cp_day,
        |  cusum AS cusum_peak
        |FROM ccp CROSS JOIN cct WHERE rn = 1""".stripMargin,

    "q_hits_scores" -> hitsSql
  )

  /** DuckDB twin of q_hits_scores: the same integer HITS rounds as
    * chained CTEs (sum() returns HUGEINT, so the ppm product is exact;
    * `//` on HUGEINT is exact floor division — positives, so it equals
    * Spark's DECIMAL(38,0) truncating `div`).
    */
  private def hitsSql: String = {
    val iters = (1 to HITS_ITERS).map { i =>
      s"""a${i}r AS (SELECT e.p, sum(h.score) AS raw
         |  FROM e JOIN h${i - 1} h ON h.id = e.c GROUP BY 1),
         |a$i AS (SELECT p AS id, CAST(CAST(raw AS HUGEINT) * 1000000
         |    // (SELECT max(raw) FROM a${i}r) AS BIGINT) AS score
         |  FROM a${i}r),
         |h${i}r AS (SELECT e.c, sum(a.score) AS raw
         |  FROM e JOIN a$i a ON a.id = e.p GROUP BY 1),
         |h$i AS (SELECT c AS id, CAST(CAST(raw AS HUGEINT) * 1000000
         |    // (SELECT max(raw) FROM h${i}r) AS BIGINT) AS score
         |  FROM h${i}r)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |h0 AS (SELECT DISTINCT c AS id, CAST(1000000 AS BIGINT) AS score
       |  FROM e),
       |$iters
       |SELECT 'hub' AS side, id, score AS score_ppm FROM h$HITS_ITERS
       |UNION ALL
       |SELECT 'auth', id, score FROM a$HITS_ITERS""".stripMargin
  }
}
