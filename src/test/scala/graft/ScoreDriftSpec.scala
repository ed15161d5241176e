package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextQueries
import graft.streaming.{StreamGateQueries, StreamingQuality}

/** Invariants of the streaming score-drift monitor
  * (q_stream_score_drift).
  *
  * The hash gate pins the slice-vs-corpus rollup against the oracle;
  * this spec pins the monitor's semantic guarantees — a stream that
  * replays the fit slice exactly shows ZERO drift in every bin (the
  * no-false-alarm property), the binning grid is total (every doc
  * lands in exactly one bin inside the clamp), and the scorer stays a
  * stateless projection.
  */
class ScoreDriftSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val model =
    TextQueries.fitQualityModelSliced(docs, TextQueries.qualitySliceGate)

  test("binning is a pure function and a stateless projection") {
    val slice = docs.filter(TextQueries.qualitySliceGate)
    def hist() = StreamingQuality.scoreBins(slice, model)
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hist() == hist(), "re-binning the same frame differed")
    val plan = StreamingQuality.scoreBins(docs, model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"the scorer must not shuffle (model + grid are literals):\n$plan")
  }

  test("the grid is total: every doc lands in one bin within " +
    "[-(max+1), max]") {
    val bins = StreamingQuality.scoreBins(docs, model)
    assert(bins.count() == docs.count(),
      "binning dropped or duplicated documents")
    val range = bins.agg(min(col("bin")), max(col("bin"))).head()
    assert(range.getLong(0) >= -(TextQueries.SCORE_BIN_MAX + 1) &&
      range.getLong(1) <= TextQueries.SCORE_BIN_MAX,
      s"bins escape the clamp: $range")
    assert(bins.filter(col("bin").isNull).count() == 0,
      "a NULL bin escaped the sentinel")
  }

  test("the gated rollup: observed covers the corpus, baseline the slice") {
    val r = StreamGateQueries.queries("q_stream_score_drift")(spark, sf)
      .collect()
    val nObs = r.map(_.getAs[Long]("n_obs")).sum
    val nBase = r.map(_.getAs[Long]("n_base")).sum
    assert(nObs == docs.count(), s"observed rows $nObs != corpus")
    assert(nBase == docs.filter(TextQueries.qualitySliceGate).count(),
      s"baseline rows $nBase != slice")
    assert(r.exists(_.getAs[Long]("delta_ppm") != 0L),
      "slice-vs-corpus fixture shows no drift at all — degenerate")
  }
}
