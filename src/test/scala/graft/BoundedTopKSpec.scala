package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native bounded_topk aggregate: equivalence with the window-ranking
  * formulation on seeded random data across many partitions (exercising
  * partial buffers, binary serialization, and merge), plus edge cases.
  */
class BoundedTopKSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("bounded_topk == row_number window ranking (random, multi-partition)") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(5000)(i =>
      (rnd.nextInt(7), rnd.nextDouble(), i.toLong))
    val df = rows.toDF("g", "score", "id").repartition(16)

    val viaAgg = df.groupBy(col("g"))
      .agg(expr("bounded_topk(score, id, 5)").as("top"))
      .select(col("g"), posexplode(col("top")))
      .toDF("g", "pos", "t")
      .select(col("g"), col("t.n").as("id"), (col("pos") + 1).as("rank"))
      .as[(Int, Long, Int)].collect().toSet

    val w = Window.partitionBy(col("g"))
      .orderBy(col("score").asc, col("id").asc)
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("g"), col("id"), col("rank"))
      .as[(Int, Long, Int)].collect().toSet

    assert(viaAgg === viaWindow)
  }

  test("bounded_topk: fewer rows than k, ties, and null inputs") {
    val df = Seq(
      (1, Some(2.0), 10L), (1, Some(1.0), 11L), (1, None, 12L),
      (2, Some(3.0), 20L), (2, Some(3.0), 19L)) // tie → id breaks it
      .toDF("g", "score", "id")
    val out = df.groupBy(col("g"))
      .agg(expr("bounded_topk(score, id, 5)").as("top"))
      .select(col("g"), col("top.n").as("ids"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(out(1) === Seq(11L, 10L)) // null score dropped, asc by score
    assert(out(2) === Seq(19L, 20L)) // equal scores → id ascending
  }

  test("bounded_topk plan: single aggregate, no Window over scored set") {
    val df = Seq((1, 1.0, 1L)).toDF("g", "score", "id")
    val plan = df.groupBy(col("g"))
      .agg(expr("bounded_topk(score, id, 3)").as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"plan:\n$plan")
    assert(plan.contains("partial_bounded_topk"), s"plan:\n$plan")
    assert(!plan.contains("Window"), s"plan:\n$plan")
  }
}
