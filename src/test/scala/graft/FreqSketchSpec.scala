package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Misra–Gries freq_sketch: exact-regime equality, approximate-regime
  * guarantees (lower bounds, bounded undercount, guaranteed heavy
  * hitters), and the PODS'12 offline merge of persisted sketches.
  */
class FreqSketchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def sketchRows(df: org.apache.spark.sql.DataFrame,
                         key: String, cap: Int): Map[String, Long] =
    df.agg(expr(s"freq_sketch($key, $cap)").as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.t"), col("e.c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact regime ≡ plain groupBy counts, stable across partitionings") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val exact = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketchRows(ev, "event_type", 64) === exact)
    assert(sketchRows(ev.repartition(13), "event_type", 64) === exact)
  }

  test("approximate regime: lower bounds, undercount ≤ n/(cap+1), heavy key kept") {
    // 400 of "hot", 1 each of 200 rare keys → n = 600
    val rows = Seq.fill(400)("hot") ++ (1 to 200).map(i => s"rare$i")
    val df = rows.toDF("k").repartition(7)
    val cap = 4
    val sk = sketchRows(df, "k", cap)
    val n = rows.length
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(sk.size <= cap)
    // every counter is a lower bound with bounded undercount
    sk.foreach { case (k, c) =>
      assert(c <= truth(k))
      assert(truth(k) - c <= n.toLong / (cap + 1))
    }
    // f(hot) = 400 > 600/5 = 120 ⇒ guaranteed present
    assert(sk.contains("hot"))
  }

  test("offline merge of per-unit sketches: exact regime reproduces totals") {
    val ev = eventsWithMs("/root/testdata/sf0.001/events.parquet")
      .withColumn("day", expr("ms div 86400000"))
    val perDay = Sketches.freqByUnit(ev, "day", "event_type", 64)
    assert(perDay.count() > 1) // the merge is actually exercised
    val merged = Sketches.mergedFreq(perDay, 64).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === exact)
  }

  test("offline merge under capacity pressure keeps MG guarantees") {
    val rows = Seq.fill(300)("hot") ++ (1 to 150).map(i => s"r$i")
    val df = rows.zipWithIndex
      .map { case (k, i) => (k, i % 5) }.toDF("k", "unit")
    val cap = 4
    val perUnit = Sketches.freqByUnit(df, "unit", "k", cap)
    val merged = Sketches.mergedFreq(perUnit, cap).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = rows.length
    assert(merged.size <= cap)
    merged.foreach { case (k, c) =>
      assert(c <= truth(k))
      // merged undercount: each unit's MG error plus the merge trim is
      // still ≤ n/(cap+1) total (mergeable-summaries bound)
      assert(truth(k) - c <= n.toLong / (cap + 1))
    }
    assert(merged.contains("hot")) // f = 300 > 450/5 = 90
  }
}
