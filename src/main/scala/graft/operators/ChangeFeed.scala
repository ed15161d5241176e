package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-feed between two snapshots of a keyed entity state —
  * the diff a CDC consumer (or a VersionedTable time-travel pair — see
  * [[VersionedTable]]) replays downstream: one row per changed key with
  * `action ∈ {insert, update, delete}` plus old/new payloads; unchanged
  * keys are dropped.
  *
  * Snapshot derivation here is "entity state as of T" over an event
  * log: per key, the event count and the latest attribute (struct-max
  * argmax on (ts, tiebreak, attr) — ONE hash aggregate per snapshot, no
  * window funnel). The diff is a single full-outer join on the key.
  *
  * 100 TB shape: both aggregates shuffle once on the entity key and the
  * join reuses that same hash partitioning (Exchange reuse — no third
  * shuffle); output volume is bounded by the number of CHANGED keys,
  * which for incremental windows is tiny relative to the table.
  */
object ChangeFeed {

  /** Entity state as of `asOf` (exclusive): per key — event count and
    * latest `attr` by (ts, tieId) desc. One aggregate, no window.
    */
  def snapshotState(events: DataFrame, key: Column, ts: Column,
                    tieId: Column, attr: Column, asOf: Column): DataFrame =
    events.filter(ts < asOf)
      .groupBy(key.as("k"))
      .agg(count(lit(1)).as("n_events"),
        max(struct(ts.as("ts"), tieId.as("tie"), attr.as("attr")))
          .as("last"))
      .select(col("k"), col("n_events"), col("last.attr").as("last_attr"))

  /** Full-outer diff of two [[snapshotState]] frames on `k`:
    * (k, action, old_n, new_n, old_attr, new_attr), unchanged keys
    * dropped. `delete` appears when `b` lost a key `a` had — for
    * time-ordered snapshots of an append-only log that branch is empty,
    * but the feed covers it (compaction / retention / GDPR erasure all
    * delete keys).
    */
  def diff(a: DataFrame, b: DataFrame): DataFrame = {
    val old_ = a.select(col("k"), col("n_events").as("old_n"),
      col("last_attr").as("old_attr"))
    val new_ = b.select(col("k"), col("n_events").as("new_n"),
      col("last_attr").as("new_attr"))
    old_.join(new_, Seq("k"), "full_outer")
      .withColumn("action",
        when(col("old_n").isNull, lit("insert"))
          .when(col("new_n").isNull, lit("delete"))
          .when(col("old_n") =!= col("new_n") ||
            col("old_attr") =!= col("new_attr"), lit("update")))
      .filter(col("action").isNotNull)
  }
}
