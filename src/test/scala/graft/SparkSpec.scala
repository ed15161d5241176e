package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession shared by every suite in the forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = graft.Graft.withStateStoreConfs(SparkSession.builder())
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // see Verify.scala: avoids pathological inferred-filter pushdown
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec {
  lazy val spark: SparkSession = TestSpark.spark

  /** events.parquet with the type-adaptive epoch-ms column appended —
    * specs must derive event time through [[Tables.epochMs]] (never a raw
    * `ts div`), so a testdata regeneration that changes the parquet
    * physical type cannot silently split specs from the engine.
    */
  def eventsWithMs(path: String): org.apache.spark.sql.DataFrame = {
    val ev = spark.read.parquet(path)
    ev.withColumn("ms", Tables.epochMs(ev))
  }
}
