package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Inverted-index search primitives — the retrieval shapes BM25 ranking
  * (q_bm25_topk) doesn't cover: exact BOOLEAN set retrieval and
  * POSITIONAL phrase matching (Manning, Raghavan & Schütze,
  * "Introduction to Information Retrieval", ch. 1–2).
  *
  * Both operators materialize postings as rows — (doc, term) for the
  * boolean index, (doc, term, position) for the positional one — and
  * run retrieval as TERM-KEYED joins, which is exactly how a
  * distributed index serves at scale: the filter `tok IN query-terms`
  * prunes the postings scan to the query's lists before any shuffle, so
  * cost follows document frequency of the query terms, never corpus
  * size. Conjunction is a count-distinct-over-matched-terms aggregate
  * (one shuffle keyed by doc), negation an anti-join, and phrase
  * adjacency a self-join on (doc, pos+1) — no row ever leaves the
  * matched lists.
  *
  * Tokenization is the corpus convention (whitespace, lowercased), so
  * the DuckDB oracle reproduces postings exactly.
  */
object Search {

  /** Conjunctive terms: docs must contain ALL of these… */
  private val MUST = Seq("table", "value")

  /** …and NONE of these. */
  private val MUST_NOT = Seq("slow")

  /** Phrase query for the positional index: adjacent tokens. */
  private val PHRASE = Seq("table", "hash")

  /** (doc_id, tok, pos) positional postings; pos is 1-based. */
  private def postings(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        posexplode(split(trim(lower(col("text"))), "\\s+"))
          .as(Seq("pos0", "tok")))
      .select(col("doc_id"), col("tok"),
        (col("pos0") + 1).cast("long").as("pos"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── boolean retrieval: AND over MUST terms, anti-join MUST_NOT ─────
    // Reports each hit with its distinct-term vocabulary size so the
    // result is more than a bare id list.
    "q_boolean_search" -> { (s, dir) =>
      val p = postings(s, dir)
      val hits = p.filter(col("tok").isin(MUST: _*))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("tok")).as("n_must"))
        .filter(col("n_must") === MUST.length)
      val negated = hits.join(
        p.filter(col("tok").isin(MUST_NOT: _*))
          .select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      negated.join(
          p.groupBy(col("doc_id"))
            .agg(countDistinct(col("tok")).as("n_terms")),
          Seq("doc_id"))
        .select(col("doc_id"), col("n_must"), col("n_terms"))
    },

    // ── positional phrase search: pos-adjacency self-join ──────────────
    "q_phrase_search" -> { (s, dir) =>
      val p = postings(s, dir)
      val first = p.filter(col("tok") === PHRASE.head)
        .select(col("doc_id"), col("pos"))
      val second = p.filter(col("tok") === PHRASE(1))
        .select(col("doc_id"), (col("pos") - 1).as("pos"))
      first.join(second, Seq("doc_id", "pos"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_occurrences"),
          min(col("pos")).as("first_pos"))
    })

  val oracle: Map[String, String] = Map(

    "q_boolean_search" -> {
      val mustList = MUST.map(t => s"'$t'").mkString(", ")
      val notList = MUST_NOT.map(t => s"'$t'").mkString(", ")
      s"""WITH toks AS (SELECT doc_id,
         |    string_split_regex(trim(lower(text)), '\\s+') AS t
         |  FROM documents WHERE length(trim(text)) > 0),
         |p AS (SELECT doc_id, t[CAST(i AS INT)] AS tok,
         |    CAST(i AS BIGINT) AS pos
         |  FROM toks, unnest(range(1, len(t) + 1)) AS u(i)),
         |hits AS (SELECT doc_id, count(DISTINCT tok) AS n_must
         |  FROM p WHERE tok IN ($mustList)
         |  GROUP BY 1 HAVING count(DISTINCT tok) = ${MUST.length}),
         |neg AS (SELECT DISTINCT doc_id FROM p WHERE tok IN ($notList)),
         |vocab AS (SELECT doc_id, count(DISTINCT tok) AS n_terms
         |  FROM p GROUP BY 1)
         |SELECT h.doc_id, h.n_must, v.n_terms
         |FROM hits h JOIN vocab v USING (doc_id)
         |WHERE h.doc_id NOT IN (SELECT doc_id FROM neg)""".stripMargin
    },

    "q_phrase_search" ->
      s"""WITH toks AS (SELECT doc_id,
         |    string_split_regex(trim(lower(text)), '\\s+') AS t
         |  FROM documents WHERE length(trim(text)) > 0),
         |p AS (SELECT doc_id, t[CAST(i AS INT)] AS tok,
         |    CAST(i AS BIGINT) AS pos
         |  FROM toks, unnest(range(1, len(t) + 1)) AS u(i))
         |SELECT a.doc_id, count(*) AS n_occurrences,
         |  min(a.pos) AS first_pos
         |FROM p a JOIN p b
         |  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |WHERE a.tok = '${PHRASE.head}' AND b.tok = '${PHRASE(1)}'
         |GROUP BY 1""".stripMargin)
}
