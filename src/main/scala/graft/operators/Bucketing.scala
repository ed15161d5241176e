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

  /** Write `df` as a bucketed+sorted managed table (overwriting). Also
    * clears any ORPHANED location first: with the default in-memory
    * catalog a fresh session forgets the table but its warehouse
    * directory survives, and saveAsTable then refuses with
    * LOCATION_ALREADY_EXISTS (a persistent metastore doesn't have this
    * failure mode — the table stays known and Overwrite just works).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    // unqualified names only: the orphan-location path below is derived
    // as <warehouse>/<lowercased name>, which is the managed-table rule
    // for the default database — a db-qualified name lives under
    // <warehouse>/<db>.db/ and would make the derivation (and delete!)
    // target the wrong directory
    require(!table.contains("."),
      s"writeBucketed takes an unqualified table name, got '$table'")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — exchange-free
    * when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
