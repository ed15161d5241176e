package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing

/** Co-located join via bucketed tables: same results as the plain join,
  * and — the point — no Exchange on either join side in the physical
  * plan (the shuffle was paid once at write time).
  */
class BucketingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("bucketed join: exchange-free plan, identical results") {
    val left = Seq.tabulate(1000)(i => (i.toLong % 100, s"l$i"))
      .toDF("k", "lv")
    val right = Seq.tabulate(500)(i => (i.toLong % 100, s"r$i"))
      .toDF("k", "rv")
    Bucketing.writeBucketed(left, "bkt_left", "k", 8)
    Bucketing.writeBucketed(right, "bkt_right", "k", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disable broadcast: at real scale neither fact side fits in memory,
    // and the bucketed layout only engages for the sort-merge path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "bkt_left", "bkt_right", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"plan:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"plan:\n$plan")
      val expected = left.join(right, "k").count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
