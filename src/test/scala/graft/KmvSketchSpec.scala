package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native kmv_sketch aggregate: the k smallest DISTINCT values — the
  * property bounded_topk cannot provide (duplicates there displace real
  * minima). Equivalence with sorted-distinct-take(k) on seeded
  * multi-partition data (exercising partial buffers, serialization,
  * and merge), duplicate-flood tolerance, and the under-k exact case.
  */
class KmvSketchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("kmv_sketch == sorted distinct take(k) across partitions") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(4000)(_ => (rnd.nextInt(5), rnd.nextInt(300).toLong))
    val df = rows.toDF("g", "h").repartition(16)
    val got = df.groupBy(col("g"))
      .agg(expr("kmv_sketch(h, 8)").as("sk"))
      .as[(Int, Seq[Long])].collect().toMap
    val want = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted.take(8)).toMap
    assert(got === want)
  }

  test("duplicate flood never displaces a real minimum") {
    // 10_000 copies of value 50 beside singletons 1..8: a non-distinct
    // top-k would fill with 50s; the KMV must hold exactly 1..8
    val df = (Seq.fill(10000)(50L) ++ (1L to 8L)).toDF("h")
      .repartition(8)
    val sk = df.agg(expr("kmv_sketch(h, 8)")).as[Seq[Long]].head()
    assert(sk === (1L to 8L))
  }

  test("under k distinct values the sketch IS the exact distinct set") {
    val sk = Seq(5L, 3L, 5L, 3L, 9L).toDF("h")
      .agg(expr("kmv_sketch(h, 100)")).as[Seq[Long]].head()
    assert(sk === Seq(3L, 5L, 9L))
  }
}
