package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Salted skew-join equivalence: identical rows to the plain join on a
  * corpus where one key holds most of the mass.
  */
class SkewJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("saltedInnerJoin == plain inner join under heavy key skew") {
    val rnd = new scala.util.Random(7)
    // 90% of the large side lands on key 1 (the hot key)
    val large = Seq.tabulate(2000) { i =>
      val k = if (rnd.nextDouble() < 0.9) 1 else 1 + rnd.nextInt(20)
      (k, i.toLong)
    }.toDF("k", "payload")
    val small = Seq.tabulate(20)(i => (i + 1, s"dim_$i")).toDF("k", "name")

    val plain = large.join(small, Seq("k"))
      .select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedInnerJoin(large, small, Seq("k"), salt = 8)
      .select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.size === 2000) // every large row matched exactly once
  }

  test("AQE skew-join splits the hot partition of a fact-fact SMJ " +
    "(the 18-SMJ tier's runtime skew defense actually fires)") {
    // The suite's session/user-keyed fact-fact joins (neither side
    // broadcastable) lean on AQE's OptimizeSkewedJoin instead of
    // explicit salting. This pins that the defense WORKS under this
    // session's config: a hot key holding ~90% of both sides must come
    // out of adaptive execution with the SMJ marked `skew=true` (the
    // oversized reducer partition replicated/split at runtime), not as
    // one straggler reducer. Thresholds are lowered to make a test-
    // sized fixture trip the same detection a 100 TB partition would.
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
    ).map(k => k ->
      scala.util.Try(spark.conf.get(k)).toOption.flatMap(Option(_)))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "8KB")
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val rnd = new scala.util.Random(11)
      // per-row RANDOM pad: the skew detector reads COMPRESSED shuffle
      // partition sizes — a constant pad deflates to nothing and the
      // hot partition never crosses the threshold
      def pad() = Seq.fill(64)(('a' + rnd.nextInt(26)).toChar).mkString
      val left = Seq.tabulate(6000) { i =>
        val k = if (rnd.nextDouble() < 0.9) 1 else 1 + rnd.nextInt(40)
        (k, i.toLong, pad())
      }.toDF("k", "lid", "lpad")
      val right = Seq.tabulate(3000) { i =>
        val k = if (rnd.nextDouble() < 0.9) 1 else 1 + rnd.nextInt(40)
        (k, i.toLong, pad())
      }.toDF("k", "rid", "rpad")
      // two shapes this fixture must avoid, both found the hard way:
      // (a) a groupBy(k) consumer — OptimizeSkewedJoin declines to
      // split a partition whose output a downstream exchange-free
      // stage still needs co-partitioned; (b) an aggregate that only
      // reads k — column pruning then ships NOTHING but the join key
      // through the shuffle and the "hot" partition is 2 KB of RLE'd
      // ints. Summing the pad lengths forces the payload across
      val joined = left.join(right, Seq("k"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("lpad"))).as("lb"),
          sum(length(col("rpad"))).as("rb"))
      joined.collect() // finalize the adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot SMJ partition skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
