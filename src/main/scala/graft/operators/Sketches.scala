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

  /** One Misra–Gries heavy-hitters sketch of `keyCol` per `unitCol`
    * value — the persisted top-k profile state (graft's `freq_sketch`
    * TypedImperativeAggregate; requires GraftExtensions).
    */
  def freqByUnit(df: DataFrame, unitCol: String, keyCol: String,
                 capacity: Int = 64): DataFrame =
    df.groupBy(col(unitCol))
      .agg(expr(s"freq_sketch($keyCol, $capacity)").as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Union a table of persisted freq sketches into one summary with
    * the PODS'12 Misra–Gries merge, entirely in DataFrame ops:
    * keywise count sum, then subtract the (capacity+1)-th largest
    * count and drop ≤ 0. The (cap+1)-sized cut list comes from ONE
    * `bounded_topk` aggregate (k-capped partials), so merging any
    * number of sketches shuffles |sketches|·capacity tiny rows and
    * never rescans raw data. Output mirrors freq_sketch rows:
    * (t, c) sorted by consumer.
    */
  def mergedFreq(sketches: DataFrame, capacity: Int = 64): DataFrame = {
    val summed = sketches
      .select(explode(col("sketch")).as("e"))
      .groupBy(col("e.t").as("t"))
      .agg(sum(col("e.c")).as("c"))
    // top cap+1 by count desc (score = −count). The id slot is filled
    // with hash(t) ONLY because bounded_topk wants a payload — it is
    // NOT a clean tiebreak (hash collisions exist, and no downstream
    // reader consumes it): the only value read out is the (cap+1)-th
    // SCORE, and when counts tie at the cut every choice of survivor
    // yields the same threshold d, so ties/collisions are harmless
    val cut = summed
      .agg(expr(
        s"bounded_topk(cast(-c as double), cast(hash(t) as bigint), ${capacity + 1})")
        .as("top"))
      .select(
        when(size(col("top")) > capacity,
          (-col("top").getItem(capacity).getField("s")).cast("long"))
          .otherwise(lit(0L)).as("d"))
    summed.crossJoin(broadcast(cut))
      .filter(col("c") - col("d") > 0)
      .select(col("t"), (col("c") - col("d")).as("c"))
  }
}
