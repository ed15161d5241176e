package graft.tools

import java.time.LocalDate

import org.apache.spark.sql.SparkSession

import graft.etl.{BronzeToSilver, SilverToGold}
import graft.sources.{BronzeIngest, FeedFetcher, HttpFeedFetcher, Layout}

/** Batch pipeline runner: ingest → silver → gold for a date (or an
  * inclusive date range), mirroring the reference's Airflow DAG
  * `bronze_ingest >> bronze_to_silver >> silver_to_gold`
  * (reference: airflow/dags/nasa_asteroid_dag.py:18-66). Scheduling
  * stays external (cron/Airflow submit this main per day); the runner
  * owns ordering and per-day isolation.
  */
object PipelineRunner {

  /** Inclusive ISO date range. */
  def dateRange(start: String, end: String): Seq[String] = {
    val s = LocalDate.parse(start)
    val e = LocalDate.parse(end)
    require(!e.isBefore(s), s"end $end before start $start")
    Iterator.iterate(s)(_.plusDays(1)).takeWhile(!_.isAfter(e))
      .map(_.toString).toSeq
  }

  /** Run the three stages for each date in order. Days are independent
    * (separate bronze files, dynamic silver partitions, keyed gold
    * merges), so a failed day can be re-run alone and re-running a
    * completed day is idempotent.
    */
  def runRange(spark: SparkSession, layout: Layout, dates: Seq[String],
               fetcher: FeedFetcher): Unit =
    dates.foreach { date =>
      BronzeIngest.ingest(spark, layout, date, fetcher)
      BronzeToSilver.run(spark, layout, date)
      SilverToGold.run(spark, layout, date)
    }

  /** CLI: <base-dir> <start-date> [end-date]. API key from
    * NASA_API_KEY (reference: src/utils/variables.py:5-15 env config);
    * DEMO_KEY default matches the reference's development posture.
    */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PipelineRunner <base> <start> [end]")
    val base = args(0)
    val start = args(1)
    val end = if (args.length > 2) args(2) else start
    val spark = SparkSession.builder()
      .appName("graft-pipeline")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try runRange(spark, Layout(base), dateRange(start, end),
      new HttpFeedFetcher(sys.env.getOrElse("NASA_API_KEY", "DEMO_KEY")))
    finally spark.stop()
  }
}
