package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev probe: run named queries under the Bench protocol while a
  * SparkListener records every JOB's wall duration — the evidence for
  * where a multi-job query (fixpoint loops, iterative trainers) spends
  * its time: N jobs × fixed scheduling cost vs data volume.
  *
  * Usage: runMain graft.tools.JobCountProbe <sfDir> <q1,q2,...>
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("q_dup_clusters")
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
    case class J(id: Int, var start: Long = 0L, var end: Long = 0L)
    val jobs = new ConcurrentLinkedQueue[J]()
    val byId = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = J(e.jobId, e.time)
        byId.put(e.jobId, j); jobs.add(j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = byId.get(e.jobId)
        if (j != null) j.end = e.time
      }
    })
    names.foreach { n =>
      (1 to 2).foreach { rep => // rep 1 pays codegen; read rep 2
        jobs.clear(); byId.clear()
        graft.CacheRegistry.releaseAll()
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sf).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let listener drain
        import scala.jdk.CollectionConverters._
        val js = jobs.asScala.toSeq
        val tot = js.map(j => math.max(0L, j.end - j.start)).sum / 1e3
        println(f"[jobs] $n rep$rep wall=$wall%.2f s jobs=${js.size} " +
          f"sum_job_ms=${tot * 1000}%.0f")
        val top = js.sortBy(j => -(j.end - j.start)).take(12)
        top.foreach(j => println(
          s"[jobs]   job ${j.id}: ${j.end - j.start} ms"))
      }
    }
    spark.stop()
  }
}
