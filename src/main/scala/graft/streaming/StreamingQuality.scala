package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextQueries

/** Serve the trained quality filter on a document STREAM — the
  * train-offline / score-online half of the quality pipeline: the
  * logistic model is fitted once on the curated batch corpus
  * ([[TextQueries.fitQualityModel]]) and every arriving document is
  * scored in-row against the model constants, exactly the forward pass
  * the trainer ran (winsorized integer z-scores under the TRAINING
  * corpus's means/sds, nano-unit weight dot product).
  *
  * Stateless by construction: the model rides the plan as literals
  * (means, sds, k+1 weights — a few dozen longs), so the stream needs
  * no broadcast join, no state store, and no watermark; each
  * micro-batch is one projection. That is the 100 TB/unbounded
  * posture: admission scoring costs O(batch) regardless of corpus or
  * stream history.
  *
  * Reference anchor: the reference scores nothing, but its silver
  * projection (`/root/reference/src/etl/bronze_to_silver.py`) is the
  * same shape — a stateless per-record enrichment between landing and
  * serving; this operator is that stage with a learned model in it.
  */
object StreamingQuality {

  /** (doc_id, score_m, verdict) per arriving document: score_m = the
    * model score s = Σ wⱼ·zⱼ in sign-split-truncated millionths (the
    * nano-unit weights × thousandth-unit z land at 10⁹ scale; div 10⁶
    * keeps the gate sums bit-stable in BIGINT at any corpus size),
    * verdict = keep ⟺ s > 0 (the trainer's own decision rule).
    */
  def scoreStream(docs: DataFrame,
                  model: TextQueries.LogitModel): DataFrame = {
    val xs = Seq("len_bp", "stop_bp", "punct_bp", "uniq_bp")
    val sE = model.scoreExpr(xs)
    TextQueries.qualityBpOf(docs)
      .withColumn("score_m", expr(model.scoreMilliExpr(xs)))
      .select(col("doc_id"), col("score_m"),
        when(expr(s"$sE > 0"), lit("keep")).otherwise(lit("drop"))
          .as("verdict"))
  }

  /** (doc_id, score_m, bin) per document: the model score binned on a
    * fixed integer grid — bin = sign-split score_m div `step`, clamped
    * to ±`bmax` via explicit CASE (Spark's greatest/least IGNORE nulls
    * while DuckDB's propagate them — CASE semantics agree), with an
    * unscorable row (NULL score) pinned to sentinel bin −(bmax+1) so
    * the drift rollup's join never meets a NULL key. One definition
    * serves the batch baseline and the stream — the monitoring twin
    * can never bin differently than its baseline.
    */
  def scoreBins(docs: DataFrame, model: TextQueries.LogitModel,
                step: Long = TextQueries.SCORE_BIN_STEP,
                bmax: Long = TextQueries.SCORE_BIN_MAX): DataFrame = {
    val xs = Seq("len_bp", "stop_bp", "punct_bp", "uniq_bp")
    TextQueries.qualityBpOf(docs)
      .withColumn("score_m", expr(model.scoreMilliExpr(xs)))
      .withColumn("bin", expr(
        s"""CASE WHEN score_m IS NULL THEN ${-(bmax + 1)}L ELSE
           |  CASE WHEN b0 > ${bmax}L THEN ${bmax}L
           |       WHEN b0 < ${-bmax}L THEN ${-bmax}L ELSE b0 END END"""
          .stripMargin.replace("b0",
            s"(CASE WHEN score_m < 0 THEN -((-score_m) div ${step}L) " +
              s"ELSE score_m div ${step}L END)")))
      .select(col("doc_id"), col("score_m"), col("bin"))
  }

  /** Labeling-queue admission on a document STREAM — the online half
    * of margin-based uncertainty sampling ([[TextQueries.marginQueue]]
    * is the batch queue): the batch fit publishes its admission cut
    * (the k-th smallest |score| and its tie doc_id, see
    * [[TextQueries.queueAdmissionCut]]) and each arriving document is
    * scored in-row and admitted iff its margin beats the cut —
    * |score_m| < thr, ties at the cut broken by doc_id ≤ tieId, the
    * batch queue's own (margin ASC, doc_id ASC) rule. A null score (a
    * doc with no scoreable text) never admits, matching the batch
    * NULLS LAST ordering.
    *
    * Stateless like [[scoreStream]]: model AND cut ride the plan as
    * literals, so admission costs O(batch) with no state store — the
    * shape an unbounded annotation pipeline ships, with the cut
    * republished on each periodic refit. Emits the admitted rows only:
    * (doc_id, score_m, margin_m).
    */
  def queueAdmissionStream(docs: DataFrame,
                           model: TextQueries.LogitModel,
                           thrMilli: Long, tieId: Long): DataFrame = {
    val xs = Seq("len_bp", "stop_bp", "punct_bp", "uniq_bp")
    TextQueries.qualityBpOf(docs)
      .withColumn("score_m", expr(model.scoreMilliExpr(xs)))
      .withColumn("margin_m", abs(col("score_m")))
      .filter(col("margin_m") < thrMilli ||
        (col("margin_m") === thrMilli && col("doc_id") <= tieId))
      .select(col("doc_id"), col("score_m"), col("margin_m"))
  }
}
