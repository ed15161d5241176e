package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Row-level grain range join: result ≡ the declarative BETWEEN join,
  * the plan is an equi-join (no nested loop), and over-long intervals
  * fail loudly instead of exploding the fan-out.
  */
class RangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private val points = Seq(
    (1L, d("2024-01-01")), (2L, d("2024-01-05")), (3L, d("2024-02-01")))
    .toDF("pid", "pt")
  private val intervals = Seq(
    (10L, d("2023-12-30"), d("2024-01-02")), // covers p1
    (11L, d("2024-01-01"), d("2024-01-07")), // covers p1, p2
    (12L, d("2024-03-01"), d("2024-03-04"))) // covers none
    .toDF("iid", "lo", "hi")

  test("matches the declarative BETWEEN join exactly") {
    val grain = RangeJoin.joinPointInInterval(points, "pt",
        intervals, "lo", "hi")
      .select(col("pid"), col("iid"))
    val naive = points.join(intervals,
        col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select(col("pid"), col("iid"))
    assert(grain.exceptAll(naive).isEmpty && naive.exceptAll(grain).isEmpty)
    assert(grain.count() === 3) // (1,10) (1,11) (2,11)
  }

  test("plan is an equi-join — no nested loop, no cartesian") {
    val plan = RangeJoin.joinPointInInterval(points, "pt",
      intervals, "lo", "hi").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"plan:\n$plan")
  }

  test("interval past the span bound fails loudly") {
    val long = Seq((20L, d("2020-01-01"), d("2024-01-01")))
      .toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.joinPointInInterval(points, "pt", long, "lo", "hi",
        maxSpanDays = 64).count()
    }
    assert(ex.getMessage != null)
  }

  test("negative interval (hi < lo) fails loudly too") {
    val bad = Seq((21L, d("2024-01-05"), d("2024-01-01")))
      .toDF("iid", "lo", "hi")
    intercept[Exception] {
      RangeJoin.joinPointInInterval(points, "pt", bad, "lo", "hi").count()
    }
  }
}
