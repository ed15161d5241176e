package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off dev probe: does Dataset.localCheckpoint preserve
  * outputPartitioning in this Spark build?
  */
object CkptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("CKPT_CONF", "false"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("=== conf canChangeCachedPlanOutputPartitioning = " +
      spark.conf.getOption(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"))
    val ckpt = spark.range(1000)
      .select(pmod(col("id"), lit(97)).as("src"),
        pmod(col("id") + 13, lit(97)).as("dst"))
      .repartition(col("src"))
      .localCheckpoint()
    println("=== ckpt executed partitioning: " +
      ckpt.queryExecution.executedPlan.outputPartitioning)
    val e = ckpt.repartition(col("src")).persist()
    e.count()
    val frontier = spark.range(5)
      .select(col("id").as("node"), lit(0L).as("dist"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = frontier.join(e, col("node") === col("src"))
    val plan = joined.queryExecution.executedPlan.toString
    println("=== exchanges in join plan: " +
      "Exchange hashpartitioning".r.findAllIn(plan).size)
    println(plan)
    spark.stop()
  }
}
