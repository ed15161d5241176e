package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Placeholder-string → null normalization.
  *
  * Net semantics of the reference's per-column loop
  * (src/etl/bronze_to_silver.py:117-124): trim every value, and map the
  * placeholders "NULL"/"Null"/"" to real nulls. Unlike the reference —
  * which applies `trim` to every column and thereby stringifies the whole
  * table (SURVEY.md §1.2) — this only rewrites string-typed columns and
  * emits ONE Project over the full column list instead of 27 stacked ones.
  */
object Normalize {

  private val placeholders = Seq("NULL", "Null", "")

  def placeholderToNull(c: Column): Column = {
    val t = trim(c)
    when(t.isin(placeholders: _*), lit(null).cast(StringType)).otherwise(t)
  }

  /** Normalize all string columns of `df` in a single projection. */
  def normalizeStrings(df: DataFrame): DataFrame = {
    val stringCols = df.schema.fields
      .filter(_.dataType == StringType).map(_.name).toSet
    df.select(df.columns.toSeq.map { c =>
      if (stringCols(c)) placeholderToNull(col(c)).as(c) else col(c)
    }: _*)
  }
}
