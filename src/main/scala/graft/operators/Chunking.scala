package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Content-defined chunking (the LBFS/rsync family: Muthitacharoen,
  * Chen & Mazières, "A Low-Bandwidth Network File System", SOSP'01) at
  * token granularity — the storage-dedup complement to the similarity
  * tier. A position is a chunk boundary when the rolling window hash
  * (here w = 2 tokens, the shared 32-bit md5-prefix integer) is
  * ≡ 0 mod [[DIV]], so boundaries follow CONTENT, not offsets: an
  * insertion early in a document shifts every fixed-size block but
  * leaves all content-defined chunks after the next boundary
  * identical. Expected chunk length is DIV tokens (geometric); no
  * min/max clamp is applied — documented, matching the plain-gear
  * formulation rather than FastCDC's normalized variant.
  *
  * 100 TB posture: the chunk decomposition is computed IN-ROW (one
  * zero-shuffle higher-order projection per doc — boundary positions,
  * then one slice+hash per chunk), not by exploding the corpus token
  * stream through a doc-keyed window, so the census costs one scan.
  * The shared-chunk query explodes only per-doc CHUNK records
  * (~n_tokens/DIV rows) into one chunk-hash-keyed aggregate — the
  * inverted-index economics every dedup family here follows. The
  * DuckDB twin intentionally uses the explode+window formulation:
  * independent derivations agreeing bit-for-bit is the gate.
  */
object Chunking {

  private val DIV = 8      // boundary divisor: expected chunk = 8 tokens
  private val WSEED = 2    // window-hash seed (2-gram boundary test)
  private val CSEED = 3    // chunk-content hash seed

  /** Per-doc chunk decomposition: (id, n_tokens, chunks) where chunks
    * is an array of (n_tok, ch) structs — chunk token count and
    * 32-bit content hash, in document order. A boundary token ENDS its
    * chunk (both engines encode the same rule).
    */
  def decompose(docs: DataFrame, id: String = "doc_id",
                text: String = "text"): DataFrame = {
    val t = col("t")
    def tok0(i: Column) = element_at(t, i + 1) // 0-based accessor
    docs.filter(length(trim(col(text))) > 0)
      .select(col(id), split(trim(lower(col(text))), "\\s+").as("t"))
      // 0-based boundary positions: window hash of (tok_{i-1}, tok_i)
      .withColumn("bpos",
        when(size(t) >= 2,
          filter(sequence(lit(1), size(t) - 1), i =>
            Dedup.hash32(WSEED,
              concat(tok0(i - 1), lit(" "), tok0(i))) % DIV === 0))
          .otherwise(array().cast("array<int>")))
      // trailing boundary ends the last chunk exactly at n-1: no extra
      // (empty) chunk beyond it
      .withColumn("nc",
        when(size(col("bpos")) === 0, lit(1))
          .otherwise(size(col("bpos")) +
            when(element_at(col("bpos"), size(col("bpos"))) === size(t) - 1,
              lit(0)).otherwise(lit(1))))
      .select(col(id), size(t).as("n_tokens"),
        transform(sequence(lit(0), col("nc") - 1), j => {
          val start = when(j === 0, lit(0))
            .otherwise(element_at(col("bpos"), j) + 1)
          val end = when(j < size(col("bpos")),
            element_at(col("bpos"), j + 1)).otherwise(size(t) - 1)
          val n = end - start + 1
          struct(n.as("n_tok"),
            Dedup.hash32(CSEED,
              array_join(slice(t, start + 1, n), " ")).as("ch"))
        }).as("chunks"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── per-doc content-defined chunk census ───────────────────────────
    // Chunk count/size distribution per document — the knob check for
    // DIV (avg ≈ DIV by the geometric boundary model) and the shape a
    // chunk-level dedup store bills by. Zero shuffle.
    "q_cdc_chunks" -> { (s, dir) =>
      decompose(Tables.load(s, dir, "documents"))
        .select(col("doc_id"), col("n_tokens"),
          size(col("chunks")).as("n_chunks"),
          expr("n_tokens div size(chunks)").as("avg_chunk_tokens"),
          array_max(transform(col("chunks"), c => c.getField("n_tok")))
            .as("max_chunk_tokens"))
    },

    // ── corpus chunk-store dedup savings ───────────────────────────────
    // The rsync/backup-store question: if the corpus were stored as
    // content-defined chunks with one copy per distinct chunk, how many
    // tokens does dedup save? One chunk-hash-keyed aggregate over the
    // exploded chunk records, then a single-row fold. Near-dup docs
    // share whole interior chunks (boundaries are content-local), so
    // this measures REAL shared-run mass, not estimator output.
    "q_cdc_shared" -> { (s, dir) =>
      val ch = decompose(Tables.load(s, dir, "documents"))
        .select(explode(col("chunks")).as("c"))
        .select(col("c.n_tok").as("n_tok"), col("c.ch").as("ch"))
      ch.groupBy(col("ch"))
        .agg(max(col("n_tok")).as("n_tok"), count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("n_chunks"),
          count(lit(1)).as("n_distinct"),
          sum(col("cnt") * col("n_tok")).as("tokens_total"),
          sum((col("cnt") - 1) * col("n_tok")).as("tokens_saved"))
        .withColumn("dedup_bp",
          expr("tokens_saved * 10000 div tokens_total"))
    }
  )

  // ─── DuckDB oracle twins (explode + doc-keyed window derivation) ─────

  private val chunksCtes =
    s"""toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
       |  FROM documents WHERE length(trim(text)) > 0),
       |tok AS (SELECT doc_id, t[CAST(pos AS INT)] AS tok, pos,
       |    CASE WHEN pos >= 2 AND ${Dedup.hash32Sql(WSEED,
              "t[CAST(pos - 1 AS INT)] || ' ' || t[CAST(pos AS INT)]")} % $DIV = 0
       |      THEN 1 ELSE 0 END AS b
       |  FROM toks, unnest(range(1, len(t) + 1)) AS u(pos)),
       |ck AS (SELECT doc_id, tok, pos,
       |    sum(b) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - b AS chunk_id
       |  FROM tok),
       |chunks AS (SELECT doc_id, chunk_id, count(*) AS n_tok,
       |    ${Dedup.hash32Sql(CSEED,
              "string_agg(tok, ' ' ORDER BY pos)")} AS ch
       |  FROM ck GROUP BY doc_id, chunk_id)""".stripMargin

  val oracle: Map[String, String] = Map(

    "q_cdc_chunks" ->
      s"""WITH $chunksCtes
         |SELECT doc_id, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  count(*) AS n_chunks,
         |  CAST(sum(n_tok) AS BIGINT) // count(*) AS avg_chunk_tokens,
         |  CAST(max(n_tok) AS BIGINT) AS max_chunk_tokens
         |FROM chunks GROUP BY doc_id""".stripMargin,

    "q_cdc_shared" ->
      s"""WITH $chunksCtes,
         |hg AS (SELECT ch, max(n_tok) AS n_tok, count(*) AS cnt
         |  FROM chunks GROUP BY ch)
         |SELECT CAST(sum(cnt) AS BIGINT) AS n_chunks,
         |  count(*) AS n_distinct,
         |  CAST(sum(cnt * n_tok) AS BIGINT) AS tokens_total,
         |  CAST(sum((cnt - 1) * n_tok) AS BIGINT) AS tokens_saved,
         |  CAST(sum((cnt - 1) * n_tok) * 10000 // sum(cnt * n_tok)
         |    AS BIGINT) AS dedup_bp
         |FROM hg""".stripMargin
  )
}
