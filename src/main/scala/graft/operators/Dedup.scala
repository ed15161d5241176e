package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document deduplication at training-data scale: exact (content hash),
  * MinHash+LSH, SimHash, and exact n-gram Jaccard.
  *
  * Everything is built from codegen'd built-ins with ONE shuffle per
  * logical step (explode → partial-agg → final-agg), no UDFs, no
  * collect. The per-(seed,shingle) hash is
  * `conv(substr(md5(seed || ':' || shingle), 1, 8), 16, 10)` — a 32-bit
  * value both Spark and DuckDB compute identically, which makes every
  * stage of the pipeline oracle-checkable.
  *
  * Scale notes (100 TB posture):
  *   - signatures: explode to (doc, shingle) then a single groupBy(doc)
  *     with N min() aggregates — map-side partial min keeps the shuffle
  *     at one row per (doc × N columns).
  *   - LSH banding: the candidate join is a self-join on (band, key);
  *     bucket sizes are bounded by collision probability, not corpus
  *     size, so the join is shuffle-bounded. A document-frequency cut
  *     (maxDf) removes degenerate stopword-shingles before the join.
  */
object Dedup {

  /** 32-bit seeded hash both Spark and DuckDB share (see object doc). */
  def hash32(seed: Int, s: Column): Column =
    conv(substring(md5(concat(lit(seed.toString), lit(":"), s)), 1, 8),
      16, 10).cast("long")

  /** SQL-text twin of [[hash32]] for DuckDB oracles. */
  def hash32Sql(seed: Int, expr: String): String =
    s"CAST(('0x' || substr(md5('$seed' || ':' || $expr), 1, 8)) AS BIGINT)"

  /** Exact dedup: group identical normalized texts, keep min-id survivor.
    * Output: fingerprint, surviving doc id, group size.
    */
  def exactGroups(docs: DataFrame, id: String, text: String): DataFrame =
    docs.groupBy(TextFunctions.fingerprint(col(text)).as("fp"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** (doc_id, shingle) pairs, distinct, with an optional document-
    * frequency cut dropping shingles present in more than maxDf docs.
    */
  def docShingles(docs: DataFrame, id: String, text: String, k: Int,
                  maxDf: Option[Int] = None): DataFrame = {
    val pairs = docs
      .select(col(id).as("doc_id"),
        explode(TextFunctions.shingles(col(text), k)).as("shingle"))
      .distinct()
    maxDf match {
      case None => pairs
      case Some(df) =>
        // count + filter + re-join beats a window here: the heavy side
        // streams through a broadcast of the small "rare shingles" set
        // when Catalyst sizes it so; one extra shuffle worst-case.
        val rare = pairs.groupBy("shingle")
          .agg(count(lit(1)).as("df_count"))
          .filter(col("df_count") <= df)
          .select("shingle")
        pairs.join(rare, "shingle").select("doc_id", "shingle")
    }
  }

  /** MinHash signatures: one row per doc, columns mh0..mh{n-1}.
    * Single shuffle: groupBy(doc_id) with n partial-min aggregates.
    */
  def minhashSignatures(docs: DataFrame, id: String, text: String,
                        k: Int = 3, numHashes: Int = 16): DataFrame = {
    val ds = docShingles(docs, id, text, k)
    val mins = (0 until numHashes).map(i =>
      min(hash32(i, col("shingle"))).as(s"mh$i"))
    ds.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** LSH candidate pairs: band the signature (bands × rowsPerBand =
    * numHashes), hash each band, self-join on (band, key). Output
    * distinct (doc_a < doc_b) candidate pairs.
    */
  def minhashCandidatePairs(docs: DataFrame, id: String, text: String,
                            k: Int = 3, numHashes: Int = 16,
                            bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sigs = minhashSignatures(docs, id, text, k, numHashes)
    val bandRows = (0 until bands).map { b =>
      val key = md5(concat_ws("-",
        (0 until r).map(j => col(s"mh${b * r + j}").cast("string")): _*))
      sigs.select(col("doc_id"), lit(b).as("band"), key.as("bkey"))
    }.reduce(_ unionAll _)
    val a = bandRows.as("a")
    val b = bandRows.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bkey") === col("b.bkey") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** 32-bit SimHash over distinct whitespace tokens. One shuffle:
    * groupBy(doc) with 32 sum(±1) aggregates, then the fingerprint is
    * folded from the bit votes as a plain expression.
    */
  def simhash32(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = docs.select(col(id).as("doc_id"),
        explode(TextFunctions.tokens(lower(col(text)))).as("tok"))
      .distinct()
      .withColumn("h", hash32(0, col("tok")))
    val votes = (0 until 32).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"bit$i"))
    val agg = toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val fp = (0 until 32).map(i =>
      when(col(s"bit$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("doc_id"), fp.as("simhash"))
  }

  /** Exact n-gram Jaccard near-dup pairs with integer-only thresholding:
    * keep pairs where jaccard >= thresholdPct/100, i.e.
    * 100*|A∩B| >= thresholdPct*(|A|+|B|-|A∩B|). Output integer counts
    * (no float in the result → hash-stable).
    */
  def jaccardPairs(docs: DataFrame, id: String, text: String, k: Int = 3,
                   maxDf: Int = 100, thresholdPct: Int = 60): DataFrame = {
    val ds = docShingles(docs, id, text, k, Some(maxDf))
    val sizes = ds.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = ds.as("a")
    val b = ds.as("b")
    val common = a.join(b, col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("sz", "sz_a"),
        col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sizes.withColumnRenamed("sz", "sz_b"),
        col("doc_b") === col("doc_id")).drop("doc_id")
      .filter(col("n_common") * 100 >=
        lit(thresholdPct) * (col("sz_a") + col("sz_b") - col("n_common")))
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        col("sz_a"), col("sz_b"))
  }
}
