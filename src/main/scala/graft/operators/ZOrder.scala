package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout clustering for multi-dimensional file
  * skipping.
  *
  * A table filtered on TWO independent columns can only be min/max-
  * pruned on one of them under a lexicographic sort: every file spans
  * the full range of the second column. Interleaving the bits of both
  * columns into one z-value and clustering on THAT gives every file a
  * tight range on BOTH dimensions (each z-range is a small axis-aligned
  * rectangle of the key space), so scan planners skip files for either
  * predicate — the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER
  * BY`.
  *
  * Everything here is pure integer bit arithmetic built from Spark
  * built-ins (shiftright/bitwiseAND/shiftleft folded over 16 unrolled
  * terms — one codegen'd expression, zero shuffle), with a
  * programmatically generated DuckDB SQL twin so the oracle stays
  * structurally in lock-step.
  *
  * 100 TB shape: the z-value is a per-row projection; the physical
  * re-layout is `repartitionByRange($"zval")` + sorted write (one range
  * shuffle, the same cost as any global sort-write). The q_zorder_layout
  * query instead buckets by the HIGH BITS of the z-value — fixed-width
  * z-ranges need no sort at all (one hash aggregate), and the per-bucket
  * min/max spans it reports are exactly the file-footer stats a pruning
  * scanner would consult.
  */
object ZOrder {

  /** Bits taken from each dimension (z-value = 2·BITS wide). */
  val BITS = 16

  /** q_zorder_layout bucket shift: fixing z-bits ≥10 makes every bucket
    * a 32×32 axis-aligned cell — tight min/max on BOTH dimensions for
    * the key ranges in this corpus (partkey < 2048, suppkey < 128).
    */
  val LAYOUT_SHIFT = 10

  private val MASK = (1L << BITS) - 1

  /** Morton interleave of the low 16 bits of two non-negative integral
    * columns: bit i of `x` lands at z-bit 2i, bit i of `y` at 2i+1.
    * Unrolled fold — one flat codegen'd expression.
    */
  def zValue(x: Column, y: Column): Column = {
    val xb = x.cast("bigint").bitwiseAND(lit(MASK))
    val yb = y.cast("bigint").bitwiseAND(lit(MASK))
    (0 until BITS).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xb, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** DuckDB twin of [[zValue]] over SQL expressions `x`, `y` —
    * disjoint-bit terms summed (equivalent to OR), fully parenthesized.
    */
  def zValueSql(x: String, y: String): String = {
    val terms = (0 until BITS).flatMap { i =>
      Seq(
        s"(((($x) & $MASK) >> $i & 1) << ${2 * i})",
        s"(((($y) & $MASK) >> $i & 1) << ${2 * i + 1})")
    }
    terms.mkString("(", " + ", ")")
  }

  /** Per-z-bucket layout statistics: bucket rows by the z-value's high
    * bits (`zval >> shift` — fixed-width z-ranges, no global sort) and
    * report the min/max of both dimensions per bucket: the file-footer
    * stats a min/max-pruning scan would use. One hash aggregate.
    */
  def spanByBucket(df: DataFrame, x: Column, y: Column,
                   shift: Int): DataFrame =
    df.select(x.as("x"), y.as("y"),
        shiftright(zValue(x, y), shift).as("zbucket"))
      .groupBy(col("zbucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
}
