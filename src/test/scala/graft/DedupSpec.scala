package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Dedup-family semantics on crafted corpora where the right answer is
  * known by construction.
  */
class DedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "THE QUICK  brown fox jumps over the lazy dog"), // exact dup of 1 mod case/ws
    (3L, "the quick brown fox jumps over the lazy cat"),  // near-dup of 1
    (4L, "completely different content about spark engines"),
    (5L, "")).toDF("doc_id", "text")

  test("exactGroups: case/whitespace-insensitive grouping, min-id survivor") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
    assert(g.count() === 4) // {1,2}, {3}, {4}, {5}
    val dup = g.filter(col("n_dups") === 2).collect().head
    assert(dup.getAs[Long]("keep_id") === 1L)
  }

  test("minhashSignatures: identical docs share signatures, one row per doc") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", k = 3,
      numHashes = 8)
    assert(sigs.count() === 4) // doc 5 has no shingles
    val rows = sigs.collect().map(r =>
      r.getAs[Long]("doc_id") -> (0 until 8).map(i => r.getAs[Long](s"mh$i")))
      .toMap
    assert(rows(1L) === rows(2L))  // identical shingle sets
    assert(rows(1L) !== rows(4L))
  }

  test("minhashCandidatePairs: dups collide, unrelated docs do not") {
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
      k = 3, numHashes = 8, bands = 4)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("estimatedJaccardPairs: exact dups estimate 100%, bounded slots") {
    val est = Dedup.estimatedJaccardPairs(docs, "doc_id", "text",
      k = 3, numHashes = 8, bands = 4).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Long]("n_agree"), r.getAs[Long]("est_jaccard_pct"))))
      .toMap
    assert(est((1L, 2L)) === ((8L, 100L))) // identical shingle sets
    assert(est.values.forall { case (n, p) =>
      n >= 0 && n <= 8 && p >= 0 && p <= 100 })
  }

  test("simhash60: identical docs equal, near-dups within small hamming") {
    val fp = Dedup.simhash60(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(fp(1L) === fp(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(1L), fp(3L)) < hamming(fp(1L), fp(4L)))
  }

  test("native minhash_affine expression ≡ the per-slot HOF reference") {
    def sigsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (0 until 8).map(i => r.getAs[Long](s"mh$i"))).toMap
    val native = sigsOf(Dedup.minhashSignatures(docs, "doc_id", "text",
      k = 3, numHashes = 8))
    val hof = sigsOf(Dedup.minhashSignaturesHof(docs, "doc_id", "text",
      k = 3, numHashes = 8))
    assert(native === hof)
  }

  test("native simhash60 expression ≡ the 60-fold HOF reference") {
    val native = Dedup.simhash60(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = Dedup.simhash60Hof(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === hof)
  }

  test("lshVerifiedPairs: subset of exact jaccard pairs, finds true dups") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", k = 3,
      maxDf = 1000, thresholdPct = 60)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val verified = Dedup.lshVerifiedPairs(docs, "doc_id", "text", k = 3,
      numHashes = 8, bands = 4, thresholdPct = 60)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(verified.subsetOf(exact)) // LSH can miss, never invent
    assert(verified.contains((1L, 2L))) // identical docs always collide
  }

  test("jaccardPairs: threshold separates near-dups from unrelated") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", k = 3,
      maxDf = 100, thresholdPct = 60)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // jaccard 1.0
    assert(pairs.contains((1L, 3L)) === (6.0 / 8.0 >= 0.6)) // 6 shared of 8 union
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("containmentPairs catches an embedded quote that jaccard misses") {
    val quote = "alpha beta gamma delta epsilon" // 3 shingles at k=3
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, quote),                 // the short source
      (2L, s"$filler $quote"),     // long doc fully containing it
      (3L, filler)                 // long doc without it
    ).toDF("doc_id", "text")
    val contain = Dedup.containmentPairs(corpus, "doc_id", "text",
        k = 3, maxDf = 100, thresholdPct = 90)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val jacc = Dedup.jaccardPairs(corpus, "doc_id", "text",
        k = 3, maxDf = 100, thresholdPct = 60)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // all 3 of doc 1's shingles appear in doc 2 → containment 100 %,
    // but the union is ~44 shingles → jaccard ≈ 0.07
    assert(contain.contains((1L, 2L)))
    assert(!jacc.contains((1L, 2L)))
    assert(!contain.contains((1L, 3L)))
  }

  test("prefixFilterPairs ≡ uncapped exact jaccard (completeness)") {
    // uncapped jaccardPairs (maxDf ≫ corpus) is the naive exact answer;
    // the prefix filter must reproduce it pair-for-pair, counts included
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Long]("n_common"), r.getAs[Long]("sz_a"),
          r.getAs[Long]("sz_b")))).toMap
    val naive = keyed(Dedup.jaccardPairs(docs, "doc_id", "text", k = 3,
      maxDf = 100000, thresholdPct = 60))
    val pf = keyed(Dedup.prefixFilterPairs(docs, "doc_id", "text",
      k = 3, thresholdPct = 60))
    assert(pf === naive)
    assert(pf.contains((1L, 2L)))
  }

  test("prefixFilterPairs: higher threshold shortens prefixes, still exact") {
    val filler = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$filler tail one"),
      (2L, s"$filler tail two"),   // ~90 % jaccard vs 1
      (3L, "unrelated content entirely different words here")
    ).toDF("doc_id", "text")
    val naive = Dedup.jaccardPairs(corpus, "doc_id", "text", k = 3,
        maxDf = 100000, thresholdPct = 80)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val pf = Dedup.prefixFilterPairs(corpus, "doc_id", "text",
        k = 3, thresholdPct = 80)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pf === naive)
    assert(pf.contains((1L, 2L)))
  }

  test("dedupAblation: monotone non-increasing curve, exact dups survive to 90") {
    val curve = Dedup.dedupAblation(docs, "doc_id", "text", k = 3,
      thresholds = Seq(50, 60, 70, 80, 90)).collect()
      .map(r => r.getAs[Long]("threshold_pct") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_tokens")))).toMap
    // (1,2) are identical (J=100) → qualify at every rung of the ladder
    assert(curve.keySet === Set(50L, 60L, 70L, 80L, 90L))
    val sorted = curve.toSeq.sortBy(_._1).map(_._2)
    assert(sorted.sliding(2).forall {
      case Seq((p1, d1, t1), (p2, d2, t2)) =>
        p2 <= p1 && d2 <= d1 && t2 <= t1
      case _ => true
    })
    assert(curve(90L)._1 >= 1) // the identical pair
  }

  test("dupSpans: full-length run for exact dups, absent for unique docs") {
    // docs 1 and 2 normalize to the same 9 tokens → all 7 3-gram
    // positions duplicated → one run of 7, span 9 (the whole doc)
    val spans = Dedup.dupSpans(docs, "doc_id", "text", k = 3, minRun = 2)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("max_run"), r.getAs[Long]("max_span")))).toMap
    assert(spans(1L) === ((7L, 9L)))
    assert(spans(2L) === ((7L, 9L)))
    assert(!spans.contains(4L)) // unique content, no duplicated grams
  }

  test("dupSpans: a shared interior span is measured, not the doc length") {
    val corpus = Seq(
      (1L, "aa bb cc shared one two three four dd ee"),
      (2L, "xx yy shared one two three four zz qq ww"),
      (3L, "pp qq2 rr ss tt uu vv")).toDF("doc_id", "text")
    // shared run: tokens "shared one two three four" = 5 tokens → 3
    // consecutive 3-grams in both docs
    val spans = Dedup.dupSpans(corpus, "doc_id", "text", k = 3, minRun = 2)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("max_run"), r.getAs[Long]("max_span")))).toMap
    assert(spans(1L) === ((3L, 5L)))
    assert(spans(2L) === ((3L, 5L)))
    assert(!spans.contains(3L))
  }

  test("dupSpanCoverage: gap-capped lag sum equals interval union") {
    val corpus = Seq(
      (1L, "aa bb cc shared one two three four dd ee"),
      (2L, "xx yy shared one two three four zz qq ww"),
      (3L, "pp qq2 rr ss tt uu vv")).toDF("doc_id", "text")
    val cov = Dedup.dupSpanCoverage(corpus, "doc_id", "text", k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("dup_span_tokens"),
          r.getAs[Long]("coverage_bp")))).toMap
    // shared 5-token span = 3 consecutive dup grams → union = 5 tokens
    assert(cov(1L) === ((10L, 5L, 5000L)))
    assert(cov(2L) === ((10L, 5L, 5000L)))
    assert(!cov.contains(3L))
    // exact dups: the whole doc is one duplicated span
    val full = Dedup.dupSpanCoverage(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("coverage_bp")).toMap
    assert(full(1L) === 10000L)
    assert(full(2L) === 10000L)
  }

  test("dupSpanCoverage: overlapping intervals are not double-counted") {
    // doc 1's dup grams sit at positions {0, 2} (gap 2 < k): intervals
    // [0..2] and [2..4] overlap at token 2. A naive per-island sum
    // would count (1+2)+(1+2) = 6; the true union is all 5 tokens and
    // the gap-capped identity gives k + min(k, 2) = 5.
    val corpus = Seq(
      (1L, "a b c d e"),       // "a b c" dup, "b c d" unique, "c d e" dup
      (2L, "a b c x c d e"),   // shares "a b c" and "c d e", not "b c d"
      (3L, "zz1 zz2 zz3")).toDF("doc_id", "text")
    val cov = Dedup.dupSpanCoverage(corpus, "doc_id", "text", k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("dup_span_tokens"))))
      .toMap
    assert(cov(1L) === ((5L, 5L)))
  }

  test("lshTuning: monotone S-curve, verified bounded by candidates") {
    val rows = Dedup.lshTuning(docs, "doc_id", "text", k = 3,
        numHashes = 8, bandConfigs = Seq(1, 2, 4, 8), thresholdPct = 60)
      .collect().map(r => (r.getAs[Long]("bands"),
        r.getAs[Long]("rows_per_band"), r.getAs[Long]("n_candidates"),
        r.getAs[Long]("n_verified"))).sortBy(_._1)
    assert(rows.map(_._1) === Seq(1L, 2L, 4L, 8L))
    rows.foreach { case (b, r, cand, ver) =>
      assert(b * r === 8L)
      assert(ver <= cand)
    }
    // more bands can only ADD candidate pairs (each band is another
    // chance to collide) and therefore never lose a verified pair
    assert(rows.map(_._3).toSeq.sliding(2).forall {
      case Seq(a, b) => a <= b; case _ => true })
    assert(rows.map(_._4).toSeq.sliding(2).forall {
      case Seq(a, b) => a <= b; case _ => true })
    // identical docs (1,2) collide in every config → always verified
    assert(rows.forall(_._4 >= 1L))
  }

  test("lshRecall: one row, found ≤ true, identical-dup corpus recalls 100%") {
    val r = Dedup.lshRecall(docs, "doc_id", "text", k = 3,
      numHashes = 8, bands = 4, thresholdPct = 60).collect().head
    val (nTrue, nFound) =
      (r.getAs[Long]("n_true"), r.getAs[Long]("n_found"))
    assert(nFound <= nTrue)
    assert(nTrue > 0) // (1,2) qualifies by construction
    val pct = r.getAs[Long]("recall_pct")
    assert(pct >= 0 && pct <= 100)
    assert(pct === nFound * 100 / nTrue)
  }
}
