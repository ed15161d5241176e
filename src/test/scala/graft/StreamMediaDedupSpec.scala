package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.streaming.StreamGateQueries

/** Invariants of the streaming media near-dup gate
  * (q_stream_media_dedup).
  *
  * The hash gate pins the rollup against the banded-aHash oracle; this
  * spec pins the batch/stream relationship directly — the streamed
  * per-media matches are exactly the symmetric closure of the batch
  * q_media_neardup pairs (same banding definition, same verify
  * radius), with the batch best-hamming preserved per media.
  */
class StreamMediaDedupSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("stream rollup ≡ symmetric closure of the batch pair set") {
    val pairs = Multimodal.queries("q_media_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue))
    assert(pairs.nonEmpty, "fixture has no media near-dups — vacuous")
    val sym = pairs.flatMap { case (a, b, h) => Seq((a, b, h), (b, a, h)) }
    val expected = sym.groupBy(_._1).map { case (id, ps) =>
      (id, ps.map(_._2).distinct.length.toLong, ps.map(_._3).min)
    }.toSet
    val streamed = StreamGateQueries
      .queries("q_stream_media_dedup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number]("n_matches").longValue,
        r.getAs[Number]("best_hamming").longValue))
      .toSet
    assert(streamed == expected,
      s"streamed ${streamed.size} media rows != closure ${expected.size}")
  }
}
