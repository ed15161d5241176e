package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Dev-only timing probe for the dedup family internals — run with
  * SPARK_GRAFT_SF_DIR to watch per-operator wall times. This is how the
  * InferFiltersFromGenerate pushdown pathology and the single-row-group
  * scan serialization were found (see Verify.scala session conf and
  * Tables.load).
  */
object DedupProbe {
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
    time("pairs nocut")(Dedup.docShingles(docs, "doc_id", "text", 3).count())
    time("pairs cut100")(Dedup.docShingles(docs, "doc_id", "text", 3, Some(100)).count())
    time("minhash sigs")(Dedup.minhashSignatures(docs, "doc_id", "text", 3, 16).count())
    time("simhash")(Dedup.simhash60(docs, "doc_id", "text").count())
    time("lsh pairs")(Dedup.minhashCandidatePairs(docs, "doc_id", "text", 3, 16, 4).count())
    time("jaccard exact")(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 100, 60).count())
    time("lsh verified")(Dedup.lshVerifiedPairs(docs, "doc_id", "text", 3, 16, 4, 60).count())
    spark.stop()
  }
}
