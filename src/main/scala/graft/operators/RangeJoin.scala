package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grain-bucketed range join: point-in-interval joins as an EQUI-join.
  *
  * Spark plans a bare `p.date BETWEEN i.lo AND i.hi` predicate (no
  * equality conjunct) as BroadcastNestedLoopJoin — O(|points|·|intervals|)
  * comparisons and a broadcast of a whole side, which stops working the
  * moment neither side is small. The standard fix is to quantize the
  * range dimension into grains: explode each interval into the grains
  * it covers, then hash-join points to interval-grains on grain
  * equality. Cost becomes |intervals|·avg_span + one shuffle of each
  * side — linear, AQE-balanced, and skew on a hot grain is an ordinary
  * hash-join skew (salt or let AQE split it), not a cross product.
  *
  * With DAY grains over DATE columns the grain equality is exact (no
  * residual post-filter): a point matches an interval iff its date
  * equals one of the interval's covered days, and each (point,
  * interval) pair meets on exactly one grain, so no dedup either.
  * Finer-than-grain bounds (timestamps) need the classic residual
  * `BETWEEN` re-check after the grain join — same plan shape, one more
  * filter — which [[joinPointInInterval]] doesn't need and so doesn't
  * pay.
  */
object RangeJoin {

  /** Inner-join `points` to `intervals` where
    * `points(ptCol) BETWEEN intervals(loCol) AND intervals(hiCol)`,
    * all three DATE columns, via the day-grain equi-join. Output
    * carries every column of both inputs except the internal grain.
    *
    * `maxSpanDays` bounds the explode fan-out: an unexpectedly long
    * interval (bad data, open-ended sentinel dates) would silently
    * multiply the interval side; past the bound the row FAILS the job
    * rather than degrading it.
    */
  def joinPointInInterval(points: DataFrame, ptCol: String,
                          intervals: DataFrame, loCol: String,
                          hiCol: String,
                          maxSpanDays: Int = 64): DataFrame = {
    val span = datediff(col(hiCol), col(loCol))
    val guarded = intervals.withColumn("_grain",
      explode(sequence(
        when(span >= 0 && span < maxSpanDays, col(loCol))
          .otherwise(raise_error(concat(
            lit(s"range-join interval spans >= $maxSpanDays days (or is " +
              "negative): "), col(loCol).cast("string"), lit(".."),
            col(hiCol).cast("string")))),
        col(hiCol))))
    points.join(guarded, col(ptCol) === col("_grain")).drop("_grain")
  }
}
