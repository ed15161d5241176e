package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation
import graft.streaming.{StreamGateQueries, StreamingDecontam}

/** Invariants of the streaming decontamination firewall
  * (q_stream_decontam).
  *
  * The hash gate pins the rollup against the batch join's oracle; this
  * spec pins the two claims behind it — the streamed hit set equals
  * the batch q_decontaminate result exactly (bloom false positives die
  * in the exact join), and the bloom prefilter actually prunes (the
  * 100 TB reason the firewall is shaped this way).
  */
class StreamDecontamSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("stream firewall rollup ≡ the batch decontamination join") {
    val batch = Curation.queries("q_decontaminate")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val streamed = StreamGateQueries.queries("q_stream_decontam")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(streamed == batch,
      s"streamed rollup (${streamed.size} docs) != batch (${batch.size})")
    assert(batch.nonEmpty, "fixture has no contamination — vacuous test")
  }

  test("the bloom prefilter prunes: surviving shingles are a strict " +
    "subset of the stream side's") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bkt = Curation.hashBucket(col("doc_id"))
    val idx = StreamingDecontam.heldIndex(
      docs.filter(bkt >= 90), Curation.DECON_K)
    val train = docs.filter(bkt < 80)
    val all = graft.operators.Dedup
      .docShingles(train, "doc_id", "text", Curation.DECON_K).count()
    val kept = graft.operators.Dedup
      .docShingles(train, "doc_id", "text", Curation.DECON_K)
      .select(graft.operators.Dedup.shingleHash(col("shingle"))
        .as("shingle"))
      .filter(graft.operators.BloomPrune.mightContain(
        idx.bloom, col("shingle")))
      .count()
    assert(kept < all,
      s"bloom kept $kept of $all shingles — no pruning happened")
  }
}
