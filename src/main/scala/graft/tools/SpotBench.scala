package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: median-of-3 timing for a few named queries at one SF,
  * under the Bench protocol (cleared caches + GC per rep) — for pricing
  * a new or changed operator without paying a full-suite run.
  *
  * Usage: runMain graft.tools.SpotBench <sfDir> <q1,q2,...>
  */
object SpotBench {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("q1_agg")
    // dev-only A/B hook: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" lands on the
    // session builder verbatim (measurement experiments, never the gate)
    val extra = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2)).collect {
        case Array(k, v) => (k, v) }
    val spark = extra.foldLeft(graft.Graft.withStateStoreConfs(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")) {
        case (b, (k, v)) => b.config(k, v) }
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "false")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "20000"))
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val ts = (1 to 3).map { _ =>
        graft.CacheRegistry.releaseAll()
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sf).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[spot] $n median ${ts.sorted.apply(1)}%.2f  " +
        s"(${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
