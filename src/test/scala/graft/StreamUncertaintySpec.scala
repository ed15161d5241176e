package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextQueries

/** Invariants of the streaming labeling-queue admission
  * (q_stream_uncertainty).
  *
  * The hash gate pins the admitted row set against the oracle's cut
  * replay; this spec pins the semantic claim behind it — that the
  * stateless stream filter under the published cut reproduces the
  * batch top-k queue EXACTLY on a corpus replay — plus the loud-refusal
  * contracts of the cut itself.
  */
class StreamUncertaintySpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("stream admission under the published cut ≡ the batch queue") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val model = TextQueries.fitQualityModel(docs)
    val batch = TextQueries.marginQueue(docs, model, TextQueries.UNC_K)
      .select("doc_id", "score_m").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = graft.streaming.StreamGateQueries
      .queries("q_stream_uncertainty")(spark, sf)
      .select("doc_id", "score_m").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch,
      s"admitted set (${streamed.size}) != batch queue (${batch.size})")
    assert(streamed.size == TextQueries.UNC_K)
  }

  test("the cut is the k-th queue row (margin of the last admit)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val model = TextQueries.fitQualityModel(docs)
    val (thr, _) =
      TextQueries.queueAdmissionCut(docs, model, TextQueries.UNC_K)
    val maxAdmitted = graft.streaming.StreamGateQueries
      .queries("q_stream_uncertainty")(spark, sf)
      .agg(org.apache.spark.sql.functions.max("margin_m"))
      .head().getLong(0)
    assert(maxAdmitted == thr,
      s"loosest admitted margin $maxAdmitted != published cut $thr")
  }

  test("a corpus too small to fill the queue is refused loudly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val model = TextQueries.fitQualityModel(docs)
    val tiny = docs.limit(TextQueries.UNC_K - 1)
    val e = intercept[IllegalArgumentException] {
      TextQueries.queueAdmissionCut(tiny, model, TextQueries.UNC_K)
    }
    assert(e.getMessage.contains("admission cut"))
  }
}
