package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: does an InMemoryRelation over
  * repartition(N, key) → sortWithinPartitions(key) expose its ordering,
  * letting a downstream SortMergeJoin skip re-sorting the cached side
  * per fixpoint round?
  *
  * MEASURED (Spark 4.1, round 14): it does NOT — the cached plan
  * exposes partitioning (under
  * canChangeCachedPlanOutputPartitioning=false) but not ordering, so a
  * pre-sorted cache pays the fill sort AND the per-round SMJ sort
  * (edge-side sorts=2 vs 1 unsorted). That's why
  * [[graft.operators.Clusters]]'s materializeEdges repartitions but
  * deliberately does NOT sortWithinPartitions.
  */
object SortColoProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = graft.StageDirs.scratch("sortcolo")
    spark.range(100000)
      .select(pmod(xxhash64(col("id")), lit(997)).as("src"),
        pmod(xxhash64(col("id") + 7), lit(997)).as("dst"))
      .write.mode("overwrite").parquet(dir)
    for (sorted <- Seq(false, true)) {
      val base = spark.read.parquet(dir).repartition(8, col("src"))
      val e = (if (sorted) base.sortWithinPartitions(col("src")) else base)
        .persist()
      e.count()
      val labels = spark.range(997)
        .select(col("id"), col("id").as("lbl"))
      val plan = e.join(labels, col("src") === col("id"))
        .groupBy(col("dst")).agg(min(col("lbl")))
        .queryExecution.executedPlan.toString
      val sortsOnEdge = "Sort \\[src".r.findAllIn(plan).size
      println(s"[sortcolo] sorted=$sorted edge-side sorts=$sortsOnEdge " +
        s"exchanges=${"ENSURE_REQUIREMENTS".r.findAllIn(plan).size}")
      if (args.contains("-v")) println(plan)
      e.unpersist()
    }
    spark.stop()
  }
}
