package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Clusters, Dedup}

/** Dev-only stage timing for the cluster-resolution family: where do
  * q_dup_clusters / q_cluster_survivors spend their time — pair
  * generation (the LSH pipeline) or the CC fixpoint (join+agg rounds +
  * parquet round-trips)?
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, dir, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    time("warmup")(docs.count())
    graft.CacheRegistry.releaseAll(); spark.catalog.clearCache()
    time("lsh verified (cold)")(
      Dedup.lshVerifiedPairs(docs, "doc_id", "text", 3, 16, 4, 60).count())
    // pairs still cached from the call above? released: measure CC on a
    // materialized local pair table to isolate the fixpoint cost
    graft.CacheRegistry.releaseAll(); spark.catalog.clearCache()
    val pairs = Dedup.lshVerifiedPairs(docs, "doc_id", "text", 3, 16, 4, 60)
      .select("doc_a", "doc_b").cache()
    pairs.count()
    time("cc fixpoint only")(
      Clusters.connectedComponents(pairs, "doc_a", "doc_b").count())
    time("cc again (warm edges)")(
      Clusters.connectedComponents(pairs, "doc_a", "doc_b").count())
    graft.CacheRegistry.releaseAll(); spark.catalog.clearCache()
    time("memberTable (cold)")(
      Clusters.memberTable(
        Dedup.lshVerifiedPairs(docs, "doc_id", "text", 3, 16, 4, 60)).count())
    spark.stop()
  }
}
