package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass data profiling.
  *
  * The reference profiles silver with ~105 separate jobs — a full
  * `count()`, then per-column `filter(isNull).count()`, then per-column
  * `distinct().count()` + `show()`, each re-reading the source
  * (reference: src/etl/bronze_to_silver.py:127-143; SURVEY.md §3.2).
  * Same information here in ONE aggregate job: `count(when(isnull))` per
  * column plus `approx_count_distinct` (HLL++) — the 100-TB-safe
  * cardinality estimate; exact distinct at that scale is a full shuffle
  * per column for a profile nobody needs exact.
  */
object DataProfiler {

  /** One row: n_rows, nulls_<c> and adist_<c> for every column. */
  def profile(df: DataFrame): DataFrame = {
    val aggs =
      df.columns.toSeq.map(c => count(when(col(c).isNull, 1)).as(s"nulls_$c")) ++
      df.columns.toSeq.map(c => approx_count_distinct(col(c)).as(s"adist_$c"))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }
}
