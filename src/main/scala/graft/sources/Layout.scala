package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Medallion-lakehouse path layout: bronze (raw JSON documents), silver
  * (partitioned parquet), gold (star-schema parquet directories).
  *
  * The reference addresses the same three prefixes in a MinIO bucket
  * (reference: src/etl/bronze_ingest.py:35, src/etl/bronze_to_silver.py:150,
  * src/etl/silver_to_gold.py:154-166). Storage is config, not logic: the
  * base may be a local dir in tests or an s3a:// prefix on a cluster —
  * everything below goes through the Hadoop FileSystem API, which
  * resolves either.
  */
final case class Layout(base: String) {
  def bronzeFile(date: String): String =
    s"$base/bronze/JSON/nasa-asteroid-data-$date.json"
  val silverAsteroids: String = s"$base/silver/asteroids"
  def silverPartition(date: String): String =
    s"$silverAsteroids/approach_date=$date"
  def gold(table: String): String = s"$base/gold/$table"
}

/** Bronze ingest: persist one raw feed document per day, byte-preserved.
  *
  * The reference GETs the NeoWs feed and `put_object`s the raw JSON
  * (reference: src/etl/bronze_ingest.py:18-37, src/utils/bucket.py:26-50).
  * The HTTP fetch is driver-side I/O, not a Spark op (SURVEY.md S1); this
  * module takes the document as a string (tests inject fixtures; a
  * production caller would fetch with java.net.http) and writes the
  * single original document — `df.write.json` would re-serialize and is
  * deliberately not used (SURVEY.md S2).
  */
object BronzeIngest {
  def writeRaw(spark: SparkSession, layout: Layout, date: String,
               document: String): String = {
    val target = new Path(layout.bronzeFile(date))
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(target, true)
    try out.write(document.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    target.toString
  }
}
