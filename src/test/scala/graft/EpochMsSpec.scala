package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Tables.epochMs]]'s cross-branch floor semantics. The helper has
  * three branches (int64 nanos, TIMESTAMP, TIMESTAMP_NTZ) that MUST agree
  * on every instant — including pre-epoch ones, where a naive `ts div 1e6`
  * (IntegralDivide truncates toward zero) would disagree with
  * `unix_millis`/DuckDB `epoch_ms` (both floor). The testdata is 2024-era
  * so a truncate-vs-floor bug would pass every oracle silently; this spec
  * is the only thing keeping the branches honest below 1970.
  */
class EpochMsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("int64-nanos branch floors pre-epoch values (not truncate-toward-zero)") {
    val nanos = Seq(-1000001000L, -1000000000L, -1000L, -1L, 0L, 1L,
      999999999L, 1000000000L)
    val df = nanos.toDF("ts")
    val got = df.select(Tables.epochMs(df).as("ms")).as[Long].collect().toSeq
    // floor(n / 1e6): -1000001000 → -1001 (truncation would give -1000)
    assert(got === Seq(-1001L, -1000L, -1L, -1L, 0L, 0L, 999L, 1000L))
  }

  test("timestamp branch agrees with the nanos branch on the same instants") {
    val micros = Seq(-86400000001L, -1000001L, -1000000L, -1L, 0L, 1L,
      999999L, 1000000L, 1705276800123456L)
    val nanosDf = micros.map(us => math.multiplyExact(us, 1000L)).toDF("ts")
    val tsDf = micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    val a = nanosDf.select(Tables.epochMs(nanosDf).as("ms")).as[Long].collect().toSeq
    val b = tsDf.select(Tables.epochMs(tsDf).as("ms")).as[Long].collect().toSeq
    assert(a === b)
  }

  test("ntz branch agrees with the timestamp branch (session tz is UTC)") {
    val micros = Seq(-1000001L, -1L, 0L, 1L, 1705276800123456L)
    val tsDf = micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    val ntzDf = tsDf.select(col("ts").cast(TimestampNTZType).as("ts"))
    val a = tsDf.select(Tables.epochMs(tsDf).as("ms")).as[Long].collect().toSeq
    val b = ntzDf.select(Tables.epochMs(ntzDf).as("ms")).as[Long].collect().toSeq
    assert(a === b)
  }

  test("unsupported ts type fails with a named contract error") {
    val df = Seq("2024-01-01").toDF("ts")
    val e = intercept[IllegalStateException](Tables.epochMs(df))
    assert(e.getMessage.contains("events.ts"))
  }
}
