package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Path-addressed table loading over the driver-generated parquet test
  * tables (TESTDATA.md). Mirrors the reference's metastore-free,
  * path-addressed layered tables (SURVEY.md §1.1) — at cluster scale these
  * would be object-store prefixes; locally they are directories.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
