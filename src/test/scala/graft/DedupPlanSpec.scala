package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.{Clusters, Dedup, DedupPlan}

/** Pins [[operators.DedupPlan]] — the shared production composition —
  * against the standalone operators the oracle gate prices
  * independently: every consumer (members, survivors, golden records,
  * summary) must match its standalone twin row-for-row, the
  * exact-first restriction must actually exclude exact-dup ids from
  * the near-dup tier, and the shared intermediates must be persisted
  * (the whole point: the LSH pipeline and CC fixpoint are paid once).
  */
class DedupPlanSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // no exact dups: facade semantics coincide with the standalone
  // (unrestricted) operators, so twins must match exactly
  private lazy val docsA = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "spark engines process distributed data very fast indeed"),
    (4L, "spark engines process distributed data very fast today"),
    (5L, "completely unrelated content about something else entirely"))
    .toDF("doc_id", "text")

  // doc 6 is an exact dup of doc 1 modulo case/whitespace: the
  // exact-first contract must keep it out of the near-dup tier
  private lazy val docsB = docsA.union(Seq(
    (6L, "THE QUICK  brown fox jumps over the lazy dog"))
    .toDF("doc_id", "text"))

  private def quality(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("quality"))

  test("members matches the standalone memberTable twin") {
    val plan = DedupPlan(docsA)
    val shared = plan.members
      .as[(Long, Long, Long)].collect().toSet
    val standalone = Clusters.memberTable(
        Dedup.lshVerifiedPairs(docsA, "doc_id", "text"))
      .as[(Long, Long, Long)].collect().toSet
    assert(shared === standalone)
    assert(shared.nonEmpty) // the corpus has near-dups by construction
    Graft.releaseCaches()
  }

  test("survivors and goldenRecords match their standalone twins") {
    val plan = DedupPlan(docsA)
    val q = quality(docsA)
    val sharedSurv = plan.survivors(q)
      .as[(Long, Long, Long, Long)].collect().toSet
    val standaloneSurv = Clusters.survivors(
        Dedup.lshVerifiedPairs(docsA, "doc_id", "text"), q)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(sharedSurv === standaloneSurv)

    val attrs = docsA.select(col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("quality"),
      length(col("text")).cast("long").as("n_chars"),
      (col("doc_id") % 2).cast("string").as("lang"))
    val golden = plan.goldenRecords(attrs)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val expected = Clusters.memberTable(
        Dedup.lshVerifiedPairs(docsA, "doc_id", "text"))
      .join(attrs, "doc_id")
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        min(struct((lit(1000) - col("quality")).as("nq"),
          col("doc_id").as("id"))).as("best"),
        max(col("quality")).as("max_quality"),
        max(col("n_chars")).as("max_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .select(col("cluster_id"), col("best.id"), col("n_members"),
        col("max_quality"), col("max_chars"), col("n_langs"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(golden === expected)
    Graft.releaseCaches()
  }

  test("exact-first: exact-dup non-survivors never reach the pair table") {
    val plan = DedupPlan(docsB)
    // doc 6 normalizes identically to doc 1 ⇒ survivor is 1; id 6 must
    // not appear on either side of the near-dup pair table
    val ids = plan.pairs.select(col("doc_a").as("i"))
      .union(plan.pairs.select(col("doc_b").as("i")))
      .as[Long].collect().toSet
    assert(!ids.contains(6L))
    assert(plan.exactSurvivors.as[Long].collect().toSet ===
      Set(1L, 2L, 3L, 4L, 5L))
    Graft.releaseCaches()
  }

  test("summary accounting adds up and matches the pipeline identity") {
    val plan = DedupPlan(docsB)
    val row = plan.summary.as[(Long, Long, Long, Long, Long)]
      .collect().head
    val (nDocs, nExactRemoved, nNearRemoved, nFinal, tokensFinal) = row
    assert(nDocs === 6L)
    assert(nExactRemoved === 1L) // doc 6
    assert(nFinal === nDocs - nExactRemoved - nNearRemoved)
    // kept docs all have text ⇒ token sum positive
    assert(tokensFinal > 0L)
    // keepList is exactly the final count and excludes every removal
    assert(plan.keepList.count() === nFinal)
    Graft.releaseCaches()
  }

  test("shared intermediates are persisted and registered") {
    val plan = DedupPlan(docsA)
    plan.members.count() // materialize the whole chain once
    assert(plan.pairs.storageLevel.useMemory ||
      plan.pairs.storageLevel.useDisk)
    assert(plan.members.storageLevel.useMemory ||
      plan.members.storageLevel.useDisk)
    assert(CacheRegistry.size > 0)
    Graft.releaseCaches()
    assert(CacheRegistry.size === 0)
  }
}
