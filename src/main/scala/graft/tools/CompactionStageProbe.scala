package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** A/B for the q_compaction drift (round-14 bench: 1.23 → 2.43 s):
  * separates the PRICE of the round-14 correctness staging
  * (`coalesce(1).localCheckpoint().repartition(64)` — the form that
  * guarantees exactly least(64, n) non-empty files) from session noise,
  * by timing each staging strategy in isolation plus the full gate.
  *
  *   a) checkpointed   — the shipped form (1-partition LogicalRDD leaf,
  *      then round-robin 64)
  *   b) collapsed      — bare `coalesce(1).repartition(64)` (the
  *      pre-r14 form CollapseRepartition rewrites; WRONG file counts
  *      on multi-partition sub-64-row inputs, timed here only to price
  *      the checkpoint)
  *   c) single-source  — restage from a one-file parquet source: write
  *      1 file, re-read (one input partition by construction), then
  *      `repartition(64)` — correct counts without a localCheckpoint,
  *      at the cost of an extra write+read
  *
  * 3 reps each, cold staging dir per rep (the lifecycle is the cost).
  */
object CompactionStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = graft.StageDirs.scratch("compaction_ab")
    val fs = new Path(base).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def src() = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))

    def timed(label: String)(f: String => Unit): Unit = {
      val ts = (1 to 3).map { i =>
        val out = s"$base/$label/$i"
        fs.delete(new Path(out), true)
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        f(out)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"STAGE_AB $label median=${ts.sorted.apply(1)}%.2f " +
        s"reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    timed("a_checkpointed") { out =>
      graft.operators.OpsGate.stageSmallFiles(src(), out)
    }
    timed("b_collapsed") { out =>
      src().coalesce(1).repartition(64).write.parquet(out)
    }
    timed("c_single_source") { out =>
      src().coalesce(1).write.parquet(s"$out/one")
      spark.read.parquet(s"$out/one").repartition(64)
        .write.parquet(s"$out/staged")
    }
    // the full gate, same protocol as CanaryProbe
    val ts = (1 to 3).map { _ =>
      graft.CacheRegistry.releaseAll()
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_compaction")(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"STAGE_AB q_compaction median=${ts.sorted.apply(1)}%.2f " +
      s"reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    fs.delete(new Path(base), true)
    spark.stop()
  }
}
