package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ChangeFeed, DataQuality, ZOrder}

/** Z-order layout, CDC change feed, and data-quality verdicts. */
class LayoutSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // reference Morton interleave, bit by bit
  private def mortonRef(x: Long, y: Long): Long =
    (0 until ZOrder.BITS).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the bit-by-bit Morton reference") {
    import spark.implicits._
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 9L),
      (1999L, 99L), (65535L, 65535L), (123456L, 7L)) // x masked to 16 bits
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z === mortonRef(x & 0xFFFF, y & 0xFFFF), s"($x,$y)")
    }
  }

  test("z-order buckets prune on BOTH dims; single-dim sort cannot") {
    // sf0.01: partkey spans ~2000, suppkey ~100 — enough key range for
    // the 32×32 cells LAYOUT_SHIFT carves (sf0.001's range is smaller
    // than one cell)
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val z = ZOrder.spanByBucket(li, col("l_partkey"), col("l_suppkey"),
      ZOrder.LAYOUT_SHIFT).collect()
    assert(z.length > 20, s"expected many 32x32 cells, got ${z.length}")

    // point predicates on each dim: fraction of buckets a min/max-
    // pruning scan must read
    def hitFrac(rows: Array[org.apache.spark.sql.Row],
                lo: String, hi: String, v: Long): Double =
      rows.count(r => r.getAs[Long](lo) <= v && v <= r.getAs[Long](hi))
        .toDouble / rows.length
    val zOnX = hitFrac(z, "x_min", "x_max", 1000L)
    val zOnY = hitFrac(z, "y_min", "y_max", 50L)
    // a partkey-sorted layout with the same bucket count: tight on x,
    // but EVERY bucket spans the full suppkey range
    val xSorted = li.select(
        (col("l_partkey") / lit(32)).cast("bigint").as("bucket"),
        col("l_partkey"), col("l_suppkey"))
      .groupBy("bucket")
      .agg(min("l_suppkey").as("y_min"), max("l_suppkey").as("y_max"))
      .collect()
    val xSortedOnY = hitFrac(xSorted, "y_min", "y_max", 50L)

    assert(zOnX < 0.4, s"z-layout should prune partkey point: $zOnX")
    assert(zOnY < 0.4, s"z-layout should prune suppkey point: $zOnY")
    assert(xSortedOnY > 0.9,
      s"single-dim layout cannot prune the other dim: $xSortedOnY")
  }

  test("change feed classifies insert/update/delete and drops unchanged") {
    import spark.implicits._
    val a = Seq((1L, 3L, "view"), (2L, 1L, "buy"), (3L, 2L, "view"))
      .toDF("k", "n_events", "last_attr")
    val b = Seq((1L, 3L, "view"),            // unchanged → dropped
        (2L, 2L, "buy"),                     // count changed → update
        (4L, 1L, "signup"))                  // new key → insert; 3 → delete
      .toDF("k", "n_events", "last_attr")
    val d = ChangeFeed.diff(a, b)
      .select("k", "action").as[(Long, String)].collect().toMap
    assert(d === Map(2L -> "update", 3L -> "delete", 4L -> "insert"))
  }

  test("snapshotState picks the latest attr by (ts, tie) with one agg") {
    import spark.implicits._
    val ev = Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"),
      (1L, 20L, 3L, "c"), (2L, 5L, 4L, "x"))
      .toDF("user_id", "ms", "event_id", "event_type")
    val rows = ChangeFeed.snapshotState(ev, col("user_id"), col("ms"),
        col("event_id"), col("event_type"), lit(100L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(rows === Set((1L, 3L, "c"), (2L, 1L, "x")))
    // cutoff excludes events at/after asOf
    val early = ChangeFeed.snapshotState(ev, col("user_id"), col("ms"),
        col("event_id"), col("event_type"), lit(15L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(early === Set((1L, 1L, "a"), (2L, 1L, "x")))
  }

  test("data-quality suite: all rules pass on the generated corpus") {
    val v = DataQuality.checks(spark, sf).collect()
      .map(r => r.getAs[String]("rule") -> r.getAs[Int]("pass")).toMap
    assert(v.size === 5)
    assert(v.values.forall(_ == 1), s"failing rules: $v")
  }
}
