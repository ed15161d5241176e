package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * - [[queries q_ann_cosine_topk]]: brute-force cosine top-k — the
  *   correctness baseline. Queries are broadcast; candidates stream, so
  *   the plan is a BroadcastNestedLoopJoin scan with no shuffle of the
  *   big side.
  * - [[queries q_ann_ivf_topk]]: IVF scale path — a deterministic
  *   centroid sample partitions the corpus into cells (one broadcast
  *   argmin pass, `min(struct)` aggregate → map-side combine); each
  *   query probes its nprobe nearest cells only, so the scored
  *   candidate set shrinks by ~nprobe/C. Same final top-k.
  *
  * Top-k runs through the native `bounded_topk` aggregate
  * ([[graft.plans.BoundedTopK]]): k-capped partial buffers combine
  * map-side, so the shuffle carries ≤ k pairs per (task, query) — a
  * window keyed by the handful of query ids would instead funnel the
  * whole N×Q scored set into Q tasks.
  *
  * Outputs are (query_id, neighbor_id, rank) — ranks, not raw floats, so
  * the DuckDB oracle compare is bit-stable (rank flips would need two
  * distinct random vectors with cosine gaps below double noise).
  */
object VectorQueries {

  private val N_QUERIES = 10 // query vectors: vec_id < 10
  private val TOP_K = 5
  private val N_CELLS = 16   // IVF centroids: vec_id < 16 (deterministic)
  private val N_PROBE = 4
  private val DUP_COPIES = 50        // planted duplicates for near-dup
  private val DUP_OFFSET = 1000000L  // planted-copy id offset
  private val NEARDUP_THRESHOLD = 0.99

  private def loadEmb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** Distributed top-k per query via the native `bounded_topk` aggregate
    * ([[graft.plans.BoundedTopK]]): the PARTIAL aggregation buffer is
    * capped at k pairs, so the map-side combine emits ≤ k rows per
    * (task, query) into the shuffle — no full-scored-set window, no
    * low-cardinality funnel, no unbounded collect_list buffers. The
    * result array is sorted by (-sim, neighbor_id), so the posexplode
    * position IS rank−1 — deterministic under ties, zero windows.
    */
  private def topkByQuery(scored: DataFrame): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(expr(s"bounded_topk(-sim, neighbor_id, $TOP_K)").as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .toDF("query_id", "pos", "t")
      .select(col("query_id"), col("t.n").as("neighbor_id"),
        (col("pos") + 1).as("rank"))

  /** Nearest-centroid cell id per vector. min(struct(d2,cell)) is an
    * argmin AGGREGATE — partial min runs map-side over NARROW
    * (vec_id, d2, cell) rows (the embeddings themselves never enter the
    * shuffle); join the resulting tiny (vec_id, cell) map back to the
    * corpus to attach vectors — AQE broadcasts it at this scale and
    * falls back to a shuffle join when the corpus is huge.
    */
  private def cellAssignment(emb: DataFrame,
                             centroids: DataFrame): DataFrame =
    emb.crossJoin(broadcast(centroids))
      .select(col("vec_id"),
        struct(l2Sq(col("embedding"), col("centroid")).as("d2"),
          col("cell").as("cell")).as("dc"))
      .groupBy(col("vec_id"))
      .agg(min(col("dc")).as("m"))
      .select(col("vec_id"), col("m.cell").as("cell"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_ann_cosine_topk" -> { (s, dir) =>
      val emb = loadEmb(s, dir)
      val qs = emb.filter(col("vec_id") < N_QUERIES)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val cands = emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cvec"))
      val scored = cands.join(broadcast(qs),
          col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", cosine(col("qvec"), col("cvec")))
      topkByQuery(scored)
    },

    "q_ann_ivf_topk" -> { (s, dir) =>
      val emb = loadEmb(s, dir)
      val centroids = emb.filter(col("vec_id") < N_CELLS)
        .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
      val cellOf = cellAssignment(emb, centroids)
      val assigned = emb.join(cellOf, "vec_id")
        .select(col("vec_id").as("neighbor_id"),
          col("embedding").as("cvec"), col("cell"))
      // probe list: each query → nprobe nearest cells
      val qs = emb.filter(col("vec_id") < N_QUERIES)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val wProbe = Window.partitionBy(col("query_id"))
        .orderBy(col("qd2").asc, col("cell").asc)
      val probes = qs.crossJoin(broadcast(centroids))
        .withColumn("qd2", l2Sq(col("qvec"), col("centroid")))
        .withColumn("prn", row_number().over(wProbe))
        .filter(col("prn") <= N_PROBE)
        .select(col("query_id"), col("qvec"), col("cell"))
      // search only the probed cells
      val scored = assigned.join(broadcast(probes), Seq("cell"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", cosine(col("qvec"), col("cvec")))
      topkByQuery(scored)
    },

    // ── embedding-cosine near-dup: cell-blocked candidates + verify ─────
    // The corpus is augmented with exact duplicate vectors (offset ids) —
    // the testdata's random embeddings have no natural near-dups (max
    // background cosine ≈ 0.6) — then candidates are pairs sharing an
    // IVF cell (bounded by cell size, never all-pairs) and the exact
    // cosine threshold keeps true near-dups. 0.99 vs the 0.6 background
    // leaves orders of magnitude more margin than float noise, so the
    // pair SET is engine-stable even though cosines are floats.
    "q_embedding_neardup" -> { (s, dir) =>
      val emb = loadEmb(s, dir).select(col("vec_id"), col("embedding"))
      val aug = emb.unionByName(
        emb.filter(col("vec_id") < DUP_COPIES)
          .select((col("vec_id") + DUP_OFFSET).as("vec_id"),
            col("embedding")))
      val centroids = emb.filter(col("vec_id") < N_CELLS)
        .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
      val assigned = aug.join(cellAssignment(aug, centroids), "vec_id")
      val a = assigned.select(col("vec_id").as("vec_a"),
        col("embedding").as("ea"), col("cell"))
      val b = assigned.select(col("vec_id").as("vec_b"),
        col("embedding").as("eb"), col("cell"))
      a.join(b, Seq("cell"))
        .filter(col("vec_a") < col("vec_b") &&
          cosine(col("ea"), col("eb")) >= NEARDUP_THRESHOLD)
        .select(col("vec_a"), col("vec_b"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q_ann_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
         |           FROM embeddings WHERE vec_id < $N_QUERIES),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cvec FROM embeddings),
         |scored AS (SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY list_cosine_similarity(qvec, cvec) DESC, neighbor_id ASC) AS rank
         |  FROM q, c WHERE query_id <> neighbor_id)
         |SELECT query_id, neighbor_id, rank FROM scored WHERE rank <= $TOP_K""".stripMargin,

    "q_ann_ivf_topk" ->
      s"""WITH cent AS (SELECT vec_id AS cell, embedding AS centroid
         |              FROM embeddings WHERE vec_id < $N_CELLS),
         |assigned AS (SELECT vec_id AS neighbor_id, cvec, cell FROM (
         |  SELECT e.vec_id, e.embedding AS cvec, cent.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_distance(e.embedding, cent.centroid) ASC, cent.cell ASC) AS arn
         |  FROM embeddings e, cent) WHERE arn = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS qvec
         |      FROM embeddings WHERE vec_id < $N_QUERIES),
         |probes AS (SELECT query_id, qvec, cell FROM (
         |  SELECT q.query_id, q.qvec, cent.cell,
         |    row_number() OVER (PARTITION BY q.query_id
         |      ORDER BY list_distance(q.qvec, cent.centroid) ASC, cent.cell ASC) AS prn
         |  FROM q, cent) WHERE prn <= $N_PROBE),
         |scored AS (SELECT p.query_id, a.neighbor_id,
         |    row_number() OVER (PARTITION BY p.query_id
         |      ORDER BY list_cosine_similarity(p.qvec, a.cvec) DESC, a.neighbor_id ASC) AS rank
         |  FROM probes p JOIN assigned a ON p.cell = a.cell
         |  WHERE p.query_id <> a.neighbor_id)
         |SELECT query_id, neighbor_id, rank FROM scored WHERE rank <= $TOP_K""".stripMargin,

    "q_embedding_neardup" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
         |           UNION ALL
         |           SELECT vec_id + $DUP_OFFSET, embedding FROM embeddings
         |           WHERE vec_id < $DUP_COPIES),
         |cent AS (SELECT vec_id AS cell, embedding AS centroid
         |         FROM embeddings WHERE vec_id < $N_CELLS),
         |assigned AS (SELECT vec_id, embedding, cell FROM (
         |  SELECT e.vec_id, e.embedding, cent.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_distance(e.embedding, cent.centroid) ASC, cent.cell ASC) AS rn
         |  FROM e, cent) WHERE rn = 1)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |FROM assigned a JOIN assigned b
         |  ON a.cell = b.cell AND a.vec_id < b.vec_id
         |WHERE list_cosine_similarity(a.embedding, b.embedding) >= $NEARDUP_THRESHOLD""".stripMargin
  )
}
