package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Dev-only 10× scale rehearsal: replicate the documents corpus with
  * offset ids (50k docs at sf0.1) and run the dedup family — a direct
  * check that the family's cost scales ~linearly and nothing reverts to
  * all-pairs behavior. Replicas share text, so near-dup outputs blow up
  * BY CONSTRUCTION (every replica pair is a dup) — wall time, not row
  * counts, is the signal here.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val docs = (0 until mult).map(i =>
        base.select((col("doc_id") + lit(i.toLong * 10_000_000L)).as("doc_id"),
          col("text")))
      .reduce(_ unionAll _)
      .repartition(32)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    time(s"docs x$mult")(docs.count())
    time("minhash sigs")(Dedup.minhashSignatures(docs, "doc_id", "text").count())
    time("simhash")(Dedup.simhash60(docs, "doc_id", "text").count())
    time("lsh pairs")(Dedup.minhashCandidatePairs(docs, "doc_id", "text").count())
    time("exact groups")(Dedup.exactGroups(docs, "doc_id", "text").count())
    spark.stop()
  }
}
