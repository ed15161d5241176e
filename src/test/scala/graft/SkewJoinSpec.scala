package graft

import org.scalatest.funsuite.AnyFunSuite

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
}
