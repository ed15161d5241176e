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
}
