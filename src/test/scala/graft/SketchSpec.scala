package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Mergeable HLL profile state: merge exactness (any grouping of the
  * same rows unions to the same estimate), incremental-vs-rebuild
  * agreement, and accuracy against the exact distinct count.
  */
class SketchSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def events = eventsWithMs(s"$sf/events.parquet")
    .withColumn("day", expr("ms div 86400000"))

  test("union of per-day sketches ≡ one-shot sketch (merge exactness)") {
    val daily = Sketches.sketchByUnit(events, "day", "user_id")
    val merged = Sketches.mergedEstimate(daily)
      .select("n_distinct").collect()(0).getLong(0)
    val oneShot = events
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))")
        .cast("long")).collect()(0).getLong(0)
    assert(merged === oneShot)
  }

  test("different partitionings union to the same estimate") {
    val byDay = Sketches.mergedEstimate(
      Sketches.sketchByUnit(events, "day", "user_id"))
      .select("n_distinct").collect()(0).getLong(0)
    val byType = Sketches.mergedEstimate(
      Sketches.sketchByUnit(events, "event_type", "user_id"))
      .select("n_distinct").collect()(0).getLong(0)
    assert(byDay === byType)
  }

  test("incremental append agrees with a from-scratch rebuild") {
    val old = events.filter(col("day") < lit(19740L))
    val fresh = events.filter(col("day") >= lit(19740L))
    assert(old.count() > 0 && fresh.count() > 0) // a real split
    val incremental = Sketches.mergedEstimate(
      Sketches.sketchByUnit(old, "day", "user_id").unionByName(
        Sketches.sketchByUnit(fresh, "day", "user_id")))
      .select("n_distinct").collect()(0).getLong(0)
    val rebuild = Sketches.mergedEstimate(
      Sketches.sketchByUnit(events, "day", "user_id"))
      .select("n_distinct").collect()(0).getLong(0)
    assert(incremental === rebuild)
  }

  test("estimate within 5 % of the exact distinct count") {
    val est = Sketches.mergedEstimate(
      Sketches.sketchByUnit(events, "day", "user_id"))
      .select("n_distinct").collect()(0).getLong(0)
    val exact = events.select("user_id").distinct().count()
    assert(math.abs(est - exact).toDouble / exact <= 0.05,
      s"estimate $est vs exact $exact")
  }
}
