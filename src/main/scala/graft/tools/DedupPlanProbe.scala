package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.DedupPlan

/** Prices the SHARED dedup composition ([[graft.operators.DedupPlan]])
  * against the four standalone cluster-family queries the bench
  * protocol prices independently (q_dup_clusters, q_cluster_survivors,
  * q_golden_record, q_dedup_pipeline — each re-derives the LSH→verify→
  * CC pipeline cold under the cleared-cache protocol).
  *
  * The shared form is what a production pipeline runs: one pair table,
  * one CC fixpoint, then every consumer is a single aggregate over the
  * persisted member table. The probe reports both totals; PERF.md
  * records the measured ratio.
  */
object DedupPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val standaloneNames = Seq("q_dup_clusters", "q_cluster_survivors",
      "q_golden_record", "q_dedup_pipeline")

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // pass 0 warms JIT/codegen for both forms; pass 1 is the record
    var standalone = 0.0
    var shared = 0.0
    for (pass <- 0 to 1) {
      standalone = standaloneNames.map { n =>
        graft.CacheRegistry.releaseAll()
        spark.catalog.clearCache()
        timed(graft.SparkEntry.queries(n)(spark, sfDir).count())
      }.sum

      graft.CacheRegistry.releaseAll()
      spark.catalog.clearCache()
      shared = timed {
        val docs = graft.Tables.load(spark, sfDir, "documents")
        val plan = DedupPlan(docs)
        val quality = docs.select(col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("quality"))
        val attrs = docs.select(col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("quality"),
          col("n_chars"), col("lang"))
        plan.members.count()          // q_dup_clusters consumer
        plan.survivors(quality).count()   // q_cluster_survivors
        plan.goldenRecords(attrs).count() // q_golden_record
        plan.summary.count()          // q_dedup_pipeline
      }
      if (pass == 1)
        println(f"DEDUPPLAN sf=$sfDir standalone4=$standalone%.2f " +
          f"shared=$shared%.2f ratio=${standalone / shared}%.2f")
    }
    spark.stop()
  }
}
