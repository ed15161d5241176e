package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Library cache discipline: every operator that persists intermediates
  * registers them, and [[Graft.releaseCaches]] leaves the session with
  * ZERO persisted RDDs — a long-lived session using the facade must not
  * accumulate cache blocks across calls (round-2 finding: four persists
  * with no unpersist anywhere).
  */
class CacheLifecycleSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon eta"),
    (3L, "one two three four five six seven"),
    (4L, "unrelated words entirely disjoint content here")
  ).toDF("doc_id", "text")

  test("dedup operators leave no persisted RDDs after releaseCaches") {
    Graft.releaseCaches() // start clean whatever other suites did
    // run every persisting operator to completion, sequentially
    Dedup.minhashCandidatePairs(docs, "doc_id", "text").count()
    Dedup.simhashNearDupPairs(docs, "doc_id", "text").count()
    Dedup.jaccardPairs(docs, "doc_id", "text").count()
    Dedup.lshVerifiedPairs(docs, "doc_id", "text").count()
    // 4 unique plans: the signature table is registered by BOTH the LSH
    // and verified paths but dedups to one handle (identical plan)
    assert(CacheRegistry.size >= 4, "operators must register their persists")
    Graft.releaseCaches()
    assert(CacheRegistry.size === 0)
    // unpersist(blocking=false) is async; poll briefly for drain
    val deadline = System.nanoTime() + 10e9.toLong
    def persisted = spark.sparkContext.getPersistentRDDs
    while (persisted.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(persisted.isEmpty,
      s"leaked cache entries: ${persisted.values.map(_.name).mkString(", ")}")
  }

  test("simhashNearDupPairs rejects radii the banding cannot guarantee") {
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 6)
    }
  }
}
