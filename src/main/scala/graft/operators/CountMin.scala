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
