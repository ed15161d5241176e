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

  /** Write the bucketed table only when it is not ALREADY the requested
    * layout of the requested source. The whole point of bucketing is
    * write-once amortization — the shuffle is paid at write time and
    * every subsequent join is exchange-free — so a repeated call (a
    * recurring job, a bench rep) must not re-pay the write.
    *
    * The check is a `_graft_bucket_tag` marker inside the table
    * directory holding the caller's layout tag (source + key + buckets):
    * underscore-prefixed files are invisible to Spark's file index, and
    * the tag survives across processes sharing a warehouse. The table
    * must ALSO still be in the catalog — bucket metadata lives there,
    * and a surviving directory whose table the (in-memory) catalog
    * forgot is an orphan that needs rewriting. The tag is written after
    * a successful save, so a crashed write (no tag) rewrites too.
    */
  def ensureBucketed(df: DataFrame, table: String, key: String,
                     buckets: Int, tag: String): Unit = {
    val spark = df.sparkSession
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tagPath = new org.apache.hadoop.fs.Path(loc, "_graft_bucket_tag")
    val fullTag = s"$tag|$key|$buckets"
    val upToDate = spark.catalog.tableExists(table) && fs.exists(tagPath) && {
      val in = fs.open(tagPath)
      try {
        // read to EOF: a single read() may short-read on HDFS/object
        // stores (tags embed source signatures + keys and can span an
        // internal buffer boundary), and a partial read must not fake a
        // tag mismatch — that is a spurious full bucketed rewrite
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        new String(out.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8) == fullTag
      } finally in.close()
    }
    if (!upToDate) {
      writeBucketed(df, table, key, buckets)
      val out = fs.create(tagPath, true)
      try out.write(fullTag.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Cheap content signature of a source path: FNV-1a over the name,
    * length, and modification time of every file under it — a
    * driver-side metadata listing, no data scan. Embed it in an
    * [[ensureBucketed]] tag so an in-place refresh of the source (same
    * path, new data) invalidates the bucketed copy instead of silently
    * serving stale rows.
    */
  def sourceSignature(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else {
      // order-insensitive combine (SUM of per-entry FNV hashes):
      // Hadoop does not guarantee recursive listing order, and a
      // listing-order change over identical content must not fake a
      // source refresh (a spurious ~3 s bucketed rewrite per table)
      val it = fs.listFiles(p, true)
      var total = 0L
      while (it.hasNext) {
        val st = it.next()
        val s = st.getPath.getName + ":" + st.getLen + ":" +
          st.getModificationTime
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
        total += h
      }
      java.lang.Long.toHexString(total)
    }
  }

  /** Join two same-bucketed tables on their bucket key — exchange-free
    * when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
