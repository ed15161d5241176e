package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** TextRank keyword extraction (Mihalcea & Tarau, "TextRank: Bringing
  * Order into Text", EMNLP'04): rank words by stationary importance in
  * the adjacency co-occurrence graph instead of raw frequency — a term
  * that co-occurs with many well-connected terms outranks a frequent
  * but isolated one. Complements q_top_terms (tf-idf) and q_pmi_cooccur
  * (pairwise association) with a GRAPH-centrality keyword signal.
  *
  * Graph: tokens are stopword-/length-filtered per doc, edges are
  * ADJACENT filtered-token pairs (window 2, the paper's default),
  * undirected with co-occurrence weights. Scoring is the weighted
  * PageRank recurrence s(v) = 0.15 + 0.85·Σᵤ s(u)·w(u,v)/wdeg(u),
  * run a FIXED [[TR_ITERS]] rounds in micro-units with truncating
  * integer division at every step — the exact q_markov_stationary /
  * q_pagerank_centrality determinism discipline, so the DuckDB oracle
  * (same unrolled recurrence in HUGEINT) matches bit-for-bit. All
  * operands non-negative → truncate ≡ floor in both engines.
  *
  * 100 TB posture: edge building is one zero-shuffle in-row transform
  * (array filter + adjacency zip) + a (src,dst)-keyed aggregate; each
  * iteration is one vocab-keyed hash join + aggregate (vocab ≪ corpus);
  * the readout is TakeOrdered(50), never a global sort. Degree is
  * attached to the edge table ONCE before the loop.
  */
object TextRank {

  private val TR_ITERS = 4

  /** Same canonical stopword list as [[graft.functions.TextFunctions]];
    * duplicated as a literal contract because the oracle needs the
    * identical list inline.
    */
  private val STOP = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it")

  private val MIN_LEN = 3
  private val TOP_K = 50

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_textrank_keywords" -> { (s, dir) =>
      val toks = Tables.load(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(split(trim(lower(col("text"))), "\\s+").as("t"))
        .select(filter(col("t"), x =>
          length(x) >= MIN_LEN && !x.isin(STOP: _*)).as("f"))
      val bi = toks.filter(size(col("f")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(f) - 1)," +
            " i -> struct(element_at(f, i) AS w1," +
            " element_at(f, i + 1) AS w2))")).as("p"))
        .select(col("p.w1"), col("p.w2"))
        .filter(col("w1") =!= col("w2"))
      // LINEAGE-TRUNCATED via localCheckpoint (round 14, the q_sssp_hops
      // lesson): the weighted edge table is the ONLY corpus-sized pass —
      // checkpointing it once makes every downstream reference (wdeg,
      // nodes, e2, the final readout join) a flat vocab-bounded leaf,
      // where plain persist left the corpus tokenize+agg subtree
      // embedded in the unrolled plan once per power-iteration round.
      // Measured at sf0.1: isolated median 3.66 → 2.48 s (PERF.md r14).
      val edges = bi.select(col("w1").as("src"), col("w2").as("dst"))
        .union(bi.select(col("w2").as("src"), col("w1").as("dst")))
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("w"))
        .localCheckpoint()
      val wdeg = edges.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
      val e2 = edges.join(wdeg, Seq("src")).localCheckpoint()
      val nodes = wdeg.select(col("src").as("term"))
      var scores = nodes.select(col("term"), lit(1000000L).as("s"))
      for (_ <- 1 to TR_ITERS) {
        val in = e2.join(scores, col("src") === col("term"))
          .groupBy(col("dst"))
          .agg(sum(expr(
            "CAST(CAST(s AS DECIMAL(38,0)) * w div wdeg" +
              " AS DECIMAL(38,0))")).as("acc"))
        scores = nodes.join(in, col("term") === col("dst"), "left")
          .select(col("term"), expr(
            "CAST(150000 + 85 * coalesce(acc, CAST(0 AS DECIMAL(38,0)))" +
              " div 100 AS BIGINT)").as("s"))
      }
      scores.join(wdeg, col("term") === col("src"))
        .select(col("term"), col("wdeg"), col("s").as("score_micro"))
        .orderBy(col("score_micro").desc, col("term").asc)
        .limit(TOP_K)
    })

  val oracle: Map[String, String] = Map(

    "q_textrank_keywords" -> {
      val stopList = STOP.map(w => s"'$w'").mkString("[", ", ", "]")
      val rounds = (1 to TR_ITERS).map { i =>
        s"""s$i AS (SELECT n.term,
           |    150000 + 85 * coalesce(i.acc, 0) // 100 AS s
           |  FROM nodes n LEFT JOIN (
           |    SELECT e2.dst AS term,
           |      sum(CAST(p.s AS HUGEINT) * e2.w // e2.wdeg) AS acc
           |    FROM e2 JOIN s${i - 1} p ON e2.src = p.term
           |    GROUP BY 1) i USING (term))""".stripMargin
      }.mkString(",\n")
      s"""WITH toks AS (
         |  SELECT string_split_regex(trim(lower(text)), '\\s+') AS t
         |  FROM documents WHERE length(trim(text)) > 0),
         |ft AS (SELECT list_filter(t, x -> length(x) >= $MIN_LEN
         |    AND NOT list_contains($stopList, x)) AS f FROM toks),
         |bi AS (SELECT f[CAST(i AS INT)] AS w1,
         |    f[CAST(i + 1 AS INT)] AS w2
         |  FROM ft, unnest(range(1, len(f))) AS u(i)
         |  WHERE len(f) >= 2),
         |bf AS (SELECT w1, w2 FROM bi WHERE w1 <> w2),
         |e0 AS (SELECT w1 AS src, w2 AS dst FROM bf
         |  UNION ALL SELECT w2, w1 FROM bf),
         |e AS (SELECT src, dst, count(*) AS w FROM e0 GROUP BY 1, 2),
         |wd AS (SELECT src, sum(w) AS wdeg FROM e GROUP BY 1),
         |e2 AS (SELECT e.src, e.dst, e.w, wd.wdeg
         |  FROM e JOIN wd USING (src)),
         |nodes AS (SELECT src AS term FROM wd),
         |s0 AS (SELECT term, CAST(1000000 AS HUGEINT) AS s FROM nodes),
         |$rounds
         |SELECT f.term, CAST(wd.wdeg AS BIGINT) AS wdeg,
         |  CAST(f.s AS BIGINT) AS score_micro
         |FROM s$TR_ITERS f JOIN wd ON f.term = wd.src
         |ORDER BY f.s DESC, f.term ASC
         |LIMIT $TOP_K""".stripMargin
    })
}
