package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms '05): the
  * fixed-size frequency summary that answers point-count and join-size
  * questions without a second corpus scan.
  *
  * Unlike Spark's HLL bytes, every cell of this sketch is a plain SUM
  * over md5-derived cells — the identical sketch falls out of any
  * engine, so the whole estimator (build, probe, error) runs under the
  * driver's DuckDB hash gate, the same design rule as q_kmv_distinct.
  *
  * 100 TB shape:
  *   - the BUILD is one corpus-sized aggregate into DEPTH·WIDTH cells
  *     (map-side combine does almost all the work — the shuffle carries
  *     at most DEPTH·WIDTH partial rows per task, whatever the corpus);
  *   - per-unit sketches MERGE by cellwise addition (associative /
  *     commutative), so incremental maintenance is a sum, not a rescan;
  *   - probes join the ≤ DEPTH·WIDTH-row sketch by broadcast;
  *   - estimates are ONE-SIDED (est ≥ exact always): the overcount is
  *     bounded by ε·N with ε = e/WIDTH at the usual analysis, and the
  *     probe output below MEASURES it instead of assuming it.
  */
object CountMin {

  /** Sketch depth (independent hash rows; the estimate takes the min). */
  val DEPTH = 4

  /** q_cms_estimate width (cells per row) — token frequency sketch. */
  val TOKEN_WIDTH = 512

  /** q_cms_join_size width — self-join cardinality sketch. */
  val JOIN_WIDTH = 1024

  /** Seed base: row d hashes with seed SEED_BASE + d (md5-prefix family,
    * same construction as [[Dedup.hash32]]).
    */
  val SEED_BASE = 31

  /** Probe set size for q_cms_estimate (exact top tokens by count). */
  val PROBE_K = 20

  /** Row-d cell of `key` in a width-`w` sketch. */
  def cell(d: Int, key: Column, w: Int): Column =
    Dedup.hash32(SEED_BASE + d, key) % w

  /** DuckDB twin of [[cell]] with the depth as a SQL expression `d`
    * (numeric || string concatenation renders `31 + d` exactly like
    * Scala's `(SEED_BASE + d).toString`).
    */
  def cellSql(dExpr: String, keyExpr: String, w: Int): String =
    s"CAST(('0x' || substr(md5(($SEED_BASE + $dExpr) || ':' || " +
      s"$keyExpr), 1, 8)) AS BIGINT) % $w"

  /** (d, cell) pairs of `key` across all DEPTH rows, as an exploded
    * struct column — static unroll so the whole projection codegens.
    * `private[graft]`: the streaming twin (q_stream_cms) binds to THE
    * same cell family so the incremental sketch is byte-identical.
    */
  private[graft] def cellsExploded(key: Column, w: Int): Column =
    explode(array((0 until DEPTH).map { d =>
      struct(lit(d).as("d"), cell(d, key, w).as("cell"))
    }: _*))

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // ── dyadic range-count machinery (q_cms_range) ───────────────────────

  /** Dyadic levels kept for the range sketch: level l summarizes
    * aligned intervals of 2^l minutes; 16 levels cover any range up to
    * 65 536 minutes (~45 days) with ≤ 2·16 sketch probes.
    */
  val RANGE_LEVELS = 16

  /** q_cms_range width per level row. */
  val RANGE_WIDTH = 256

  /** Probe range, minutes since epoch (2024-01-08T00:00 through
    * 2024-01-21T23:59 UTC inclusive — a two-week slice of the fixture's
    * January 2024 event log; constants so oracle and engine agree).
    */
  val RANGE_LO_MIN = 19730L * 1440
  val RANGE_HI_MIN = 19743L * 1440 + 1439

  /** Canonical dyadic cover of the inclusive integer range [a, b]:
    * the unique minimal set of aligned (level, index) intervals, each
    * [j·2^l, (j+1)·2^l), greedily taking the largest aligned block that
    * fits. Pure integer function of constants — the Spark plan and the
    * DuckDB oracle embed the SAME literal cover.
    */
  def dyadicCover(a: Long, b: Long): Seq[(Int, Long)] = {
    require(a >= 0 && b >= a, s"bad range [$a, $b]")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var lo = a
    val end = b + 1
    while (lo < end) {
      var l = 0
      while (l + 1 < RANGE_LEVELS && lo % (1L << (l + 1)) == 0 &&
        lo + (1L << (l + 1)) <= end) l += 1
      buf += ((l, lo >> l))
      lo += 1L << l
    }
    buf.toSeq
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── CMS point estimates vs exact, on the token stream ──────────────
    // Build one DEPTH×TOKEN_WIDTH sketch over ALL token occurrences,
    // then probe it with the exact top-PROBE_K tokens (count desc, token
    // asc — deterministic) and report est vs exact per probe. The CMS
    // guarantee is one-sided: overcount ≥ 0 always (min over DEPTH sums
    // of non-negative collisions), and this query MEASURES the actual
    // collision noise at the heavy end of the distribution, where the
    // relative error is smallest — the calibration a pipeline reads
    // before trusting the sketch for filter thresholds.
    //
    // Scale: tf is the vocab-sized token census (one corpus aggregate,
    // map-side combined); the sketch build explodes DEPTH cells per
    // DISTINCT token (vocab-sized, not corpus-sized) and re-aggregates
    // into ≤ DEPTH·TOKEN_WIDTH rows; probes = TakeOrdered(PROBE_K).
    "q_cms_estimate" -> { (s, dir) =>
      val tf = docs(s, dir)
        .select(explode(TextFunctions.tokens(lower(col("text"))))
          .as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val sketch = tf
        .select(col("cnt"), cellsExploded(col("tok"), TOKEN_WIDTH).as("dc"))
        .groupBy(col("dc.d").as("d"), col("dc.cell").as("cell"))
        .agg(sum(col("cnt")).as("c"))
      val probes = tf.orderBy(col("cnt").desc, col("tok").asc)
        .limit(PROBE_K)
      probes
        .select(col("tok"), col("cnt"),
          cellsExploded(col("tok"), TOKEN_WIDTH).as("dc"))
        .join(broadcast(sketch),
          col("dc.d") === sketch("d") && col("dc.cell") === sketch("cell"))
        .groupBy(col("tok").as("token"))
        .agg(max(col("cnt")).as("exact_count"),
          min(col("c")).as("est_count"))
        .withColumn("overcount", col("est_count") - col("exact_count"))
    },

    // ── CMS inner-product join-size estimate ───────────────────────────
    // |events ⋈ events ON user_id| = Σ_u n_u² — the quantity a planner
    // wants BEFORE running a fact-fact join. The CMS estimate is the
    // min over rows of Σ_cell c², computable from the DEPTH·JOIN_WIDTH
    // sketch alone (AMS-style inner product of the sketch with itself;
    // one-sided: collisions only ever add cross terms, so est ≥ exact).
    // Squares ride DECIMAL(38,0): a 10¹¹-row key could put n_u² past
    // int64, and Σ_cell c² crosses it far earlier.
    //
    // Scale: one user-keyed aggregate (the only corpus-sized exchange);
    // the sketch and both estimates live on ≤ DEPTH·JOIN_WIDTH rows.
    "q_cms_join_size" -> { (s, dir) =>
      val per = Tables.load(s, dir, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      val exact = per.agg(
        sum(expr("CAST(n AS DECIMAL(38,0)) * n")).as("exact_d"))
      val est = per
        .select(col("n"),
          cellsExploded(col("user_id").cast("string"), JOIN_WIDTH)
            .as("dc"))
        .groupBy(col("dc.d").as("d"), col("dc.cell").as("cell"))
        .agg(sum(col("n")).as("c"))
        .groupBy(col("d"))
        .agg(sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("ip"))
        .agg(min(col("ip")).as("est_d"))
      exact.crossJoin(broadcast(est))
        .select(col("exact_d").cast("long").as("exact_pairs"),
          col("est_d").cast("long").as("est_pairs"))
        .withColumn("over_ppm", expr(
          "CAST((CAST(est_pairs AS DECIMAL(38,0)) - exact_pairs)" +
            " * 1000000 div exact_pairs AS BIGINT)"))
    },

    // ── dyadic CMS: range counts answered from sketch state alone ──────
    // "How many events in [Jan 8, Jan 21]?" WITHOUT rescanning: keep
    // one CMS per dyadic level of the minute index (level l summarizes
    // aligned 2^l-minute blocks), and any range decomposes into ≤ 2·L
    // aligned blocks (Cormode–Muthukrishnan's range extension), each a
    // single point probe. est = Σ over the canonical cover of the
    // min-over-depths cell — one-sided like every CMS read.
    //
    // Scale: the corpus-sized pass is ONE minute-grain census
    // (value-grouped: bounded by the time domain — ~5·10⁵ rows/year at
    // ANY corpus size); levels × depths explode off the census, never
    // off raw events, into ≤ LEVELS·DEPTH·WIDTH sketch rows of
    // persisted profile state. The cover is a pure function of the
    // range constants, embedded as the same literal table in both
    // engines. The fixture ranges over minutes; the machinery is
    // dimension-agnostic (any non-negative integer grain).
    "q_cms_range" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val census = ev
        .select(graft.Tables.epochMs(ev).as("ms"))
        .selectExpr("ms div 60000 AS m")
        .groupBy(col("m")).agg(count(lit(1)).as("cnt"))
      val levelCells = explode(array((0 until RANGE_LEVELS).flatMap {
        l =>
          (0 until DEPTH).map { d =>
            struct(lit(l).as("l"), lit(d).as("d"),
              cell(d, concat(lit(s"$l:"),
                shiftright(col("m"), l).cast("string")), RANGE_WIDTH)
                .as("cell"))
          }
      }: _*))
      val sketch = census
        .select(col("cnt"), levelCells.as("lc"))
        .groupBy(col("lc.l").as("l"), col("lc.d").as("d"),
          col("lc.cell").as("cell"))
        .agg(sum(col("cnt")).as("c"))
      val coverDf = {
        import s.implicits._
        dyadicCover(RANGE_LO_MIN, RANGE_HI_MIN).toDF("l", "j")
      }
      val probes = coverDf.select(col("l"), col("j"),
        explode(array((0 until DEPTH).map { d =>
          struct(lit(d).as("d"),
            cell(d, concat(col("l").cast("string"), lit(":"),
              col("j").cast("string")), RANGE_WIDTH).as("cell"))
        }: _*)).as("dc"))
      val est = probes
        .join(broadcast(sketch),
          probes("l") === sketch("l") &&
            col("dc.d") === sketch("d") &&
            col("dc.cell") === sketch("cell"), "left")
        .groupBy(probes("l"), col("j"))
        .agg(min(coalesce(col("c"), lit(0L))).as("blk"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("blk")).as("est_range"))
      val exact = census
        .filter(col("m").between(RANGE_LO_MIN, RANGE_HI_MIN))
        .agg(coalesce(sum(col("cnt")), lit(0L)).as("exact_range"))
      exact.crossJoin(broadcast(est))
        .select(col("n_intervals"), col("exact_range"), col("est_range"))
        .withColumn("over_ppm", expr(
          """CASE WHEN exact_range = 0 THEN CAST(NULL AS BIGINT)
            |  ELSE (est_range - exact_range) * 1000000 div exact_range
            |END""".stripMargin))
    })

  val oracle: Map[String, String] = Map(
    "q_cms_estimate" ->
      s"""WITH toks AS (SELECT string_split_regex(trim(lower(text)), '\\s+') AS t
         |  FROM documents WHERE length(trim(text)) > 0),
         |tf AS (SELECT tok, count(*) AS cnt
         |  FROM toks, unnest(t) AS u(tok) GROUP BY 1),
         |cells AS (SELECT tok, cnt, d,
         |    ${cellSql("d", "tok", TOKEN_WIDTH)} AS cell
         |  FROM tf, unnest(range(0, $DEPTH)) AS dd(d)),
         |sk AS (SELECT d, cell, sum(cnt) AS c FROM cells GROUP BY 1, 2),
         |probes AS (SELECT tok, cnt FROM tf
         |  ORDER BY cnt DESC, tok ASC LIMIT $PROBE_K),
         |pc AS (SELECT p.tok, p.cnt, d,
         |    ${cellSql("d", "p.tok", TOKEN_WIDTH)} AS cell
         |  FROM probes p, unnest(range(0, $DEPTH)) AS dd(d))
         |SELECT pc.tok AS token, max(pc.cnt) AS exact_count,
         |  CAST(min(sk.c) AS BIGINT) AS est_count,
         |  CAST(min(sk.c) - max(pc.cnt) AS BIGINT) AS overcount
         |FROM pc JOIN sk ON sk.d = pc.d AND sk.cell = pc.cell
         |GROUP BY 1""".stripMargin,

    "q_cms_range" -> {
      val coverVals = dyadicCover(RANGE_LO_MIN, RANGE_HI_MIN)
        .map { case (l, j) => s"($l, $j)" }.mkString(", ")
      s"""WITH ev AS (SELECT epoch_ms(ts) // 60000 AS m FROM events),
         |census AS (SELECT m, count(*) AS cnt FROM ev GROUP BY 1),
         |cells AS (SELECT cnt, l, d,
         |    CAST(('0x' || substr(md5(($SEED_BASE + d) || ':' ||
         |      (l || ':' || CAST((m >> l) AS VARCHAR))), 1, 8))
         |      AS BIGINT) % $RANGE_WIDTH AS cell
         |  FROM census, unnest(range(0, $RANGE_LEVELS)) AS ll(l),
         |    unnest(range(0, $DEPTH)) AS dd(d)),
         |sk AS (SELECT l, d, cell, sum(cnt) AS c
         |  FROM cells GROUP BY 1, 2, 3),
         |cover(l, j) AS (VALUES $coverVals),
         |pc AS (SELECT cover.l, cover.j, d,
         |    CAST(('0x' || substr(md5(($SEED_BASE + d) || ':' ||
         |      (cover.l || ':' || CAST(cover.j AS VARCHAR))), 1, 8))
         |      AS BIGINT) % $RANGE_WIDTH AS cell
         |  FROM cover, unnest(range(0, $DEPTH)) AS dd(d)),
         |blk AS (SELECT pc.l, pc.j, min(coalesce(sk.c, 0)) AS blk
         |  FROM pc LEFT JOIN sk ON sk.l = pc.l AND sk.d = pc.d
         |    AND sk.cell = pc.cell
         |  GROUP BY 1, 2),
         |es AS (SELECT count(*) AS n_intervals,
         |    CAST(sum(blk) AS BIGINT) AS est_range FROM blk),
         |ex AS (SELECT coalesce(CAST(sum(cnt) AS BIGINT), 0)
         |    AS exact_range
         |  FROM census WHERE m BETWEEN $RANGE_LO_MIN AND $RANGE_HI_MIN)
         |SELECT n_intervals, exact_range, est_range,
         |  CASE WHEN exact_range = 0 THEN CAST(NULL AS BIGINT)
         |    ELSE CAST((est_range - exact_range) * 1000000
         |      // exact_range AS BIGINT) END AS over_ppm
         |FROM ex, es""".stripMargin
    },

    "q_cms_join_size" ->
      s"""WITH per AS (SELECT user_id, count(*) AS n
         |  FROM events GROUP BY 1),
         |ex AS (SELECT sum(CAST(n AS HUGEINT) * n) AS exact_d FROM per),
         |cells AS (SELECT n, d,
         |    ${cellSql("d", "CAST(user_id AS VARCHAR)", JOIN_WIDTH)} AS cell
         |  FROM per, unnest(range(0, $DEPTH)) AS dd(d)),
         |sk AS (SELECT d, cell, sum(n) AS c FROM cells GROUP BY 1, 2),
         |ip AS (SELECT d, sum(CAST(c AS HUGEINT) * c) AS ip
         |  FROM sk GROUP BY 1),
         |es AS (SELECT min(ip) AS est_d FROM ip)
         |SELECT CAST(exact_d AS BIGINT) AS exact_pairs,
         |  CAST(est_d AS BIGINT) AS est_pairs,
         |  CAST((est_d - exact_d) * 1000000 // exact_d AS BIGINT)
         |    AS over_ppm
         |FROM ex, es""".stripMargin)
}
