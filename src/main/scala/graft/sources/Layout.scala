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

/** Feed document source. The production implementation is an HTTP GET;
  * tests inject fixture documents. Driver-side I/O, not a Spark op
  * (SURVEY.md S1).
  */
trait FeedFetcher {
  /** Returns the raw JSON document for the inclusive date range. */
  def fetch(startDate: String, endDate: String): String
}

/** NeoWs feed over java.net.http (reference: src/etl/bronze_ingest.py:18-27
  * GETs `…/neo/rest/v1/feed?start_date&end_date&api_key`). Untestable in
  * this zero-egress sandbox — the unit tests stub [[FeedFetcher]]
  * instead; this class is the production wiring.
  */
final class HttpFeedFetcher(
    apiKey: String,
    endpoint: String = "https://api.nasa.gov/neo/rest/v1/feed")
  extends FeedFetcher {

  def fetch(startDate: String, endDate: String): String = {
    val uri = java.net.URI.create(
      s"$endpoint?start_date=$startDate&end_date=$endDate&api_key=$apiKey")
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder(uri).GET().build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(
        s"feed fetch failed: HTTP ${resp.statusCode()} for $startDate..$endDate")
    resp.body()
  }
}

/** Bronze ingest: persist one raw feed document per day, byte-preserved.
  *
  * The reference GETs the NeoWs feed and `put_object`s the raw JSON
  * (reference: src/etl/bronze_ingest.py:18-37, src/utils/bucket.py:26-50).
  * [[writeRaw]] writes the single original document — `df.write.json`
  * would re-serialize and is deliberately not used (SURVEY.md S2);
  * [[ingest]] composes a [[FeedFetcher]] with the raw write.
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

  /** Fetch one day's feed and persist it raw (reference
    * bronze_ingest.py:18-37 end-to-end).
    */
  def ingest(spark: SparkSession, layout: Layout, date: String,
             fetcher: FeedFetcher): String =
    writeRaw(spark, layout, date, fetcher.fetch(date, date))
}
