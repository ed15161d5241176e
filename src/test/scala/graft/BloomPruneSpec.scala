package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomPrune

/** Bloom semi-join pruning: exactness, selectivity, and plan shape. */
class BloomPruneSpec extends AnyFunSuite with SparkSpec {

  private def keyed(n: Int, stride: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong * stride, s"v$i")).toDF("k", "v")
  }

  test("no false negatives: pruned semi-join equals exact semi-join") {
    val probe = keyed(5000, 1)
    val build = keyed(500, 7) // every 7th key, half outside probe range
    val bloom = BloomPrune.buildBloom(build, col("k"), 500, 0.03)
    val pruned = probe.filter(BloomPrune.mightContain(bloom, col("k")))
      .join(build.select(col("k")).distinct(), "k")
      .select("k").collect().map(_.getLong(0)).sorted
    val exact = probe.join(build.select(col("k")).distinct(), "k")
      .select("k").collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq === exact.toSeq)
  }

  test("an undersized bloom (high fpp) still yields exact results") {
    val probe = keyed(5000, 1)
    val build = keyed(200, 13)
    // n=10 for 200 inserted keys → saturated filter, fpp near 1:
    // pruning degrades, correctness must not
    val bloom = BloomPrune.buildBloom(build, col("k"), 10, 0.5)
    val pruned = probe.filter(BloomPrune.mightContain(bloom, col("k")))
      .join(build.select(col("k")).distinct(), "k")
      .count()
    val exact = probe.join(build.select(col("k")).distinct(), "k").count()
    assert(pruned === exact)
  }

  test("prefilter keeps a small fraction of a disjoint-heavy probe side") {
    val probe = keyed(20000, 1)
    val build = keyed(100, 211) // ~100 true hits in probe range
    val bloom = BloomPrune.buildBloom(build, col("k"), 100, 0.01)
    val kept = probe.filter(BloomPrune.mightContain(bloom, col("k"))).count()
    // true matches ≈ 95; 1% fpp over 20k ≈ 200 — kept must be well
    // under a broadcast-free shuffle of all 20k
    assert(kept < 1000, s"bloom kept $kept of 20000")
    assert(kept >= probe.join(build.select(col("k")).distinct(), "k").count())
  }

  test("probe is a map-side Filter below the join exchange") {
    // parquet-backed (a LocalRelation probe would be constant-folded
    // at plan time and the Filter node would vanish)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val probe = li.select(col("l_partkey").as("k"))
    val build = li.select(col("l_partkey").as("k"))
      .filter(col("k") < 20).distinct()
    val bloom = BloomPrune.buildBloom(build, col("k"), 50, 0.03)
    val plan = probe.filter(BloomPrune.mightContain(bloom, col("k")))
      .join(build, "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected bloom probe in physical plan:\n$plan")
    // the filter must sit on the probe's scan side, not above the join
    val filterIdx = plan.indexOf("might_contain")
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      "bloom filter should be below (printed after) the join operator")
  }

  test("query twins: q_bloom_decontaminate equals q_decontaminate") {
    val sf = "/root/testdata/sf0.001"
    val a = graft.operators.Curation.queries("q_decontaminate")(spark, sf)
      .collect().map(_.toSeq).toSet
    val b = graft.operators.Curation.queries("q_bloom_decontaminate")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
