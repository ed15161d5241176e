package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout for co-located joins.
  *
  * Writing both sides of a recurring large-×-large join bucketed (and
  * sorted) by the join key lets Spark plan a SortMergeJoin with NO
  * exchange on either side — the shuffle is paid once at write time and
  * amortized over every subsequent join, the decisive layout choice for
  * fact-to-fact joins at 100 TB. Bucketing requires the catalog
  * (`saveAsTable`); plain path-addressed parquet cannot carry bucket
  * metadata.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (overwriting). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — exchange-free
    * when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
