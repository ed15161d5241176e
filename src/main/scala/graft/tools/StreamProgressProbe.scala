package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Dev probe: run named stream-gate queries once each while a
  * StreamingQueryListener prints every micro-batch's duration
  * breakdown (triggerExecution / getBatch / addBatch / walCommit /
  * stateOperators) — the evidence for WHERE a streaming gate's wall
  * time goes (per-batch machinery vs the transform itself).
  *
  * Usage: runMain graft.tools.StreamProgressProbe <sfDir> <q1,q2,...>
  */
object StreamProgressProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("q_stream_attribution")
    val spark = graft.Graft.withStateStoreConfs(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        println(s"[sq] started ${e.name}")
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        println(s"[sq] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${d}")
        p.stateOperators.foreach { so =>
          println(s"[sq]   state op=${so.operatorName} commit=" +
            s"${so.commitTimeMs}ms rowsUpdated=${so.numRowsUpdated} " +
            s"memUsed=${so.memoryUsedBytes}")
        }
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        println(s"[sq] terminated")
    })
    names.foreach { n =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sf).count()
      println(f"[sq] $n total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
