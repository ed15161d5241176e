package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, counting, quality signals, language ID, fingerprints.
  *
  * All are pure `Column` expressions over built-ins (codegen'd, no UDFs),
  * so they stay inside whole-stage codegen and scale linearly with no
  * shuffle. Where a DuckDB oracle must reproduce the value exactly, the
  * building blocks are restricted to functions both engines share
  * (md5, regexp, split, length).
  */
object TextFunctions {

  /** Whitespace tokenization. `split` on \s+ after trim; empty text → []. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array())
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word-piece segments — letter runs, digit
    * runs, single punctuation marks — the usual pre-tokenizer shape.
    * Counted as regex MATCHES (not lookaround splits) so the pattern is
    * RE2-safe and the DuckDB oracle can run it verbatim.
    */
  val subwordPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit(subwordPattern), lit(0)))

  /** Redaction rule patterns (q_blocklist_redact). Both are RE2-safe
    * (word-boundary + alternation, no lookaround) so Spark's Java regex
    * and DuckDB's RE2 agree match-for-match. The blocklist names the
    * "sensitive terms" a scrub stage would strip — terms chosen to
    * actually occur in the synthetic corpus so the machinery is
    * exercised with nonzero hits; a real deployment swaps the list.
    */
  val blocklistPattern = "(?i)\\b(customer|vector|stream)\\b"

  /** Conventional email shape; matches nothing on the synthetic corpus
    * but is the canonical PII rule and costs one codegen'd regex pass.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Count of non-alphanumeric, non-space chars (punctuation proxy). */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))

  /** Count of alphabetic chars. */
  def alphaCount(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z]", ""))

  private val stopwords =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Number of stopword tokens (English heuristic list). */
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => lower(t).isin(stopwords: _*)))

  /** Integer quality score in [0,100]: length band + stopword presence +
    * punctuation sanity. Integer arithmetic only (oracle-exact).
    */
  def qualityScore(text: Column): Column = {
    val n = length(text)
    val toks = tokenCount(text)
    val stops = stopwordCount(text)
    val punct = punctCount(text)
    val lenScore = when(n >= 200 && n <= 5000, 40)
      .when(n >= 50, 20).otherwise(0)
    val stopScore = when(toks > 0 && stops * 100 >= toks * 2, 30)
      .otherwise(0)
    val punctScore = when(n > 0 && punct * 100 <= n * 10, 30).otherwise(0)
    (lenScore + stopScore + punctScore).cast("int")
  }

  /** Language-ID heuristic: scores each candidate language by marker-token
    * hits and keeps the argmax (deterministic tie-break by list order).
    * Marker lists are tiny n-gram/stopword cues; 'und' when nothing hits.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "was", "with"),
    "es" -> Seq("el", "la", "los", "las", "es", "y"),
    "fr" -> Seq("le", "la", "les", "est", "et", "une"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "zh" -> Seq("de", "shi", "le", "zai", "he", "you"))

  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isin(markers: _*)))
    }
    // argmax with first-wins tie-break, expressed as nested CASE
    val best = scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }
    when(best._2 > 0, best._1).otherwise(lit("und"))
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text.
    * Shared md5 makes this oracle-exact in DuckDB.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Polynomial rolling hash (Rabin–Karp): fold of
    * `acc·257 + codepoint mod 2³¹−1` over the characters — the
    * order-sensitive fingerprint family used for content-defined
    * chunking. Pure integer fold, so DuckDB's `list_reduce` reproduces
    * it bit-for-bit (its first-element init equals the zero-init fold
    * after one step).
    */
  def rollingHash(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => (acc * 257L + c) % 2147483647L)

  /** Word k-shingles from an ALREADY-MATERIALIZED token-array column:
    * array of k-grams joined by a single space, size < k → empty array.
    *
    * `toks` must be a bound attribute (aliased in its own projection),
    * not a composite expression: this function references it once per
    * lambda element, so passing `tokens(text)` directly would re-run the
    * regex split per element — O(tokens²) per row. [[shingles]] wraps the
    * single-expression form for small inputs.
    */
  def shinglesFromTokens(toks: Column, k: Int): Column =
    when(size(toks) < k, array()).otherwise(
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))

  /** Word k-shingles straight from text — convenience form; prefer
    * binding [[tokens]] to a column and using [[shinglesFromTokens]] in
    * anything performance-sensitive (see that method's caveat).
    */
  def shingles(text: Column, k: Int): Column =
    shinglesFromTokens(tokens(lower(text)), k)
}
