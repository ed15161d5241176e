package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD'03) — the MOSS algorithm. Complements the dedup tier's other
  * fingerprint families: MinHash/LSH estimates WHOLE-document Jaccard,
  * SimHash whole-document cosine-ish similarity, while winnowing
  * selects a deterministic, position-robust SUBSET of k-gram hashes
  * with a hard guarantee — any shared token run of at least K+W-1
  * tokens yields at least one shared selected fingerprint — at an
  * expected density of 2/(W+1). That makes it the right tool for
  * PARTIAL overlap (quotation, boilerplate, plagiarism) that whole-doc
  * Jaccard thresholds miss, at a per-doc index cost ~2·m/(W+1)
  * postings instead of m.
  *
  * Selection rule (the paper's): per sliding window of W consecutive
  * k-gram hashes keep the minimum, breaking ties by RIGHTMOST
  * position; record (hash, position); de-duplicate. Both engines
  * compute the identical rule — rightmost-min falls out of
  * first-position-on-the-reversed-window in Spark and DuckDB alike —
  * and the gram hash is the shared md5-prefix integer
  * ([[Dedup.hash32]]), so the gate compares bit-for-bit.
  *
  * 100 TB posture: selection is ONE zero-shuffle projection (in-row
  * higher-order functions, O(m·W) per doc); the fingerprint index is
  * the only materialized state, at winnowing density ≈ 2/(W+1) ≈ 0.4
  * postings per gram here. The match query is an fp-keyed equi-join
  * whose postings are bounded by that density times the [[MAX_DF]]
  * document-frequency cap (hot boilerplate grams are dropped exactly
  * like the Jaccard tier's stopword shingles) — no all-pairs path.
  * Encoded selections pack (hash, position) into one BIGINT
  * (hash·2²⁰ + pos), which bounds docs to 2²⁰ grams; longer docs
  * should be chunked upstream (q_pack_chunks) — documented, not
  * silently wrong, because position would overflow into the hash and
  * the gate would catch the drift.
  */
object Winnow {

  private val K = 3         // token k-gram size (matches the dedup tier)
  private val W = 4         // winnow window: guarantee threshold K+W-1 = 6 tokens
  private val MAX_DF = 100  // fingerprint document-frequency cap (skew guard)
  private val MIN_SHARED = 3 // match floor: ≥3 shared fingerprints
  private val POS_BITS = 1048576L // 2^20: (fp, pos) packed as fp·2^20 + pos

  /** Per-doc winnowing selections: (id, n_grams, sels) where sels is
    * the de-duplicated encoded (hash·2²⁰ + pos) selection set. Docs
    * shorter than k+w-1 tokens have no full window and are excluded —
    * the guarantee is vacuous below the threshold length.
    */
  def selections(docs: DataFrame, id: String = "doc_id",
                 text: String = "text", k: Int = K,
                 w: Int = W): DataFrame = {
    val h = docs.filter(length(trim(col(text))) > 0)
      .select(col(id),
        split(trim(lower(col(text))), "\\s+").as("t"))
      .filter(size(col("t")) >= k + w - 1)
      // positional k-grams, then the shared 32-bit md5-prefix hash per
      // gram — all in-row, so the corpus scan is the only I/O
      .select(col(id),
        transform(sequence(lit(0), size(col("t")) - k),
          i => array_join(slice(col("t"), i + 1, lit(k)), " ")).as("gs"))
      .select(col(id),
        transform(col("gs"), g => Dedup.hash32(0, g)).as("h"))
    h.select(col(id), size(col("h")).as("n_grams"),
      array_distinct(transform(sequence(lit(0), size(col("h")) - w), j => {
        val win = slice(col("h"), j + 1, lit(w))
        val mn = array_min(win)
        // rightmost min: first position in the REVERSED window, both
        // engines; pos is the 0-based gram index j + w - posFromRight
        mn * POS_BITS + j.cast("long") + w - array_position(reverse(win), mn)
      })).as("sels"))
  }

  /** Distinct (id, fp) fingerprint postings under the df cap. */
  def postings(docs: DataFrame, id: String = "doc_id",
               text: String = "text", k: Int = K, w: Int = W,
               maxDf: Int = MAX_DF): DataFrame = {
    val fps = selections(docs, id, text, k, w)
      .select(col(id), explode(col("sels")).as("s"))
      .select(col(id), expr(s"s div $POS_BITS").as("fp"))
      .distinct()
    val dfreq = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    fps.join(dfreq, "fp").select(col(id), col("fp"))
  }

  /** Partial-overlap pairs: docs sharing ≥ `minShared` selected
    * fingerprints — fp-keyed inverted-index join, no all-pairs path.
    */
  def matches(docs: DataFrame, id: String = "doc_id",
              text: String = "text", k: Int = K, w: Int = W,
              maxDf: Int = MAX_DF, minShared: Int = MIN_SHARED): DataFrame = {
    val kept = postings(docs, id, text, k, w, maxDf)
    kept.as("a")
      .join(kept.as("b"),
        col("a.fp") === col("b.fp") && col(s"a.$id") < col(s"b.$id"))
      .groupBy(col(s"a.$id").as("doc_a"), col(s"b.$id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── per-doc winnowing fingerprint census ────────────────────────────
    // n_selected/density_bp against n_windows verifies the 2/(W+1)
    // density theory corpus-wide (the paper's Theorem: expected density
    // of robust winnowing is 2/(w+1); observed ≈ 4200 bp vs 4000 bp
    // theoretical at W=4 on the synthetic corpus).
    "q_winnow_fingerprints" -> { (s, dir) =>
      selections(Tables.load(s, dir, "documents"))
        .select(col("doc_id"), col("n_grams"),
          size(col("sels")).as("n_selected"),
          expr(s"size(sels) * 10000 div (n_grams - ${W - 1})")
            .as("density_bp"))
    },

    // ── partial-overlap pairs via shared winnow fingerprints ────────────
    // The quotation/boilerplate detector: pairs sharing ≥ MIN_SHARED
    // selected fingerprints. Catches 6-token shared runs that sit far
    // below any whole-doc Jaccard threshold. fp-keyed join over capped
    // postings — candidate volume is Σ df², bounded by the cap, same
    // economics as the Jaccard tier's inverted index.
    "q_winnow_matches" -> { (s, dir) =>
      matches(Tables.load(s, dir, "documents"))
    }
  )

  // ─── DuckDB oracle twins ──────────────────────────────────────────────

  // grams → per-position 32-bit hashes → window-min selections, the
  // same rightmost-tie rule via list_position on the reversed slice
  /** The selection chain MINUS the leading `toks` CTE — composable
    * into oracles whose chains already define the identical `toks`
    * (TextQueries' q_detector_agreement).
    */
  private[operators] val selTailCtes =
    s"""grams AS (SELECT doc_id,
       |    list_transform(range(1, len(t) - ${K - 2}), i ->
       |      array_to_string(t[CAST(i AS INT):CAST(i + ${K - 1} AS INT)], ' ')) AS gs
       |  FROM toks WHERE len(t) >= ${K + W - 1}),
       |hs AS (SELECT doc_id,
       |    list_transform(gs, g -> ${Dedup.hash32Sql(0, "g")}) AS h
       |  FROM grams),
       |sel AS (SELECT doc_id, len(h) AS n_grams,
       |    list_distinct(list_transform(range(0, len(h) - ${W - 1}), j ->
       |      list_min(h[CAST(j+1 AS INT):CAST(j+$W AS INT)]) * $POS_BITS
       |      + j + $W - list_position(
       |          list_reverse(h[CAST(j+1 AS INT):CAST(j+$W AS INT)]),
       |          list_min(h[CAST(j+1 AS INT):CAST(j+$W AS INT)])))) AS sels
       |  FROM hs)""".stripMargin

  private val selCtes =
    s"""toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
       |  FROM documents WHERE length(trim(text)) > 0),
       |$selTailCtes""".stripMargin

  /** [[selTailCtes]] extended through the match-pair table
    * `wmp(doc_a, doc_b, n_shared)` — the partial-overlap pair chain
    * for composition (shares nothing but `toks` with the LSH chain).
    */
  private[operators] val matchPairsTail =
    s"""$selTailCtes,
       |fps AS (SELECT DISTINCT doc_id, s // $POS_BITS AS fp
       |  FROM sel, unnest(sels) AS u(s)),
       |wkept AS (SELECT doc_id, fp FROM fps WHERE fp IN
       |  (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= $MAX_DF)),
       |wmp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    count(*) AS n_shared
       |  FROM wkept a JOIN wkept b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= $MIN_SHARED)""".stripMargin

  val oracle: Map[String, String] = Map(

    "q_winnow_fingerprints" ->
      s"""WITH $selCtes
         |SELECT doc_id, n_grams,
         |  CAST(len(sels) AS BIGINT) AS n_selected,
         |  CAST(len(sels) AS BIGINT) * 10000 // (n_grams - ${W - 1}) AS density_bp
         |FROM sel""".stripMargin,

    "q_winnow_matches" ->
      s"""WITH toks AS (SELECT doc_id,
         |    string_split_regex(trim(lower(text)), '\\s+') AS t
         |  FROM documents WHERE length(trim(text)) > 0),
         |$matchPairsTail
         |SELECT doc_a, doc_b, n_shared FROM wmp""".stripMargin
  )
}
