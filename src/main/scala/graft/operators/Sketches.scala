package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketch tables over Spark's built-in
  * DataSketches HLL functions (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate`) — the 100 TB profile pattern the one-shot
  * `approx_count_distinct` cannot give you:
  *
  *   - build ONE small sketch per partition unit (day, source, shard)
  *     at ingest time and PERSIST it — the corpus-sized scan happens
  *     once, when the data is written;
  *   - answer "distinct users over any day range / source subset" by
  *     unioning the selected sketches — register-maxima merges are
  *     associative, commutative, and idempotent, so the query cost is
  *     O(|sketches|), never a rescan;
  *   - the estimate after any grouping of the same rows is IDENTICAL
  *     (merge exactness — pinned by spec), so incremental daily
  *     maintenance and a from-scratch rebuild agree bit-for-bit.
  *
  * Spec-only (no DuckDB oracle): sketch bytes are engine-specific by
  * nature — the same reason q_profile_approx is the one rows-only
  * waiver. SketchSpec pins merge exactness, incremental-vs-rebuild
  * agreement, and estimate accuracy against the exact count.
  */
object Sketches {

  /** One HLL sketch of `keyCol` per `unitCol` value (e.g. per day):
    * the persisted profile-state table. lgK = 12 ⇒ ~2 KB per sketch,
    * ~1.6 % relative standard error.
    */
  def sketchByUnit(df: DataFrame, unitCol: String, keyCol: String,
                   lgK: Int = 12): DataFrame =
    df.groupBy(col(unitCol))
      .agg(expr(s"hll_sketch_agg($keyCol, $lgK)").as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Union a (filtered) sketch table into one distinct estimate —
    * O(|sketches|), no raw-data rescan.
    */
  def mergedEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(
      expr("hll_sketch_estimate(hll_union_agg(sketch))")
        .cast("long").as("n_distinct"),
      sum(col("n_rows")).as("n_rows"))
}
