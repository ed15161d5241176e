package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Pipeline observability via `Dataset.observe`: named metrics (row
  * counts, null counts, sums) that ride the EXISTING action — unlike a
  * Deequ-style post-hoc audit there is no second scan, and unlike
  * accumulators the values are tied to exactly one query execution
  * (no double-counting on retries/reuse). The write itself reports
  * what it wrote.
  *
  * 100 TB posture: observe() plants an `CollectMetrics` operator — a
  * streaming-safe, partial-aggregated side computation with constant
  * memory — so instrumenting a petabyte write costs one extra
  * map-side fold, not a pass.
  */
object Observability {

  /** Attach standard write-audit metrics to `df` under `name`:
    * n_rows, plus a null count per listed column. Read the values
    * back through a [[MetricsTap]] after any action on the result.
    */
  def audited(df: DataFrame, name: String,
              nullCheckCols: Seq[String] = Nil): DataFrame = {
    val nullCounts = nullCheckCols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_null_$c"))
    df.observe(name, count(lit(1)).as("n_rows"), nullCounts: _*)
  }

  /** Captures observed metrics from completed query executions. The
    * listener bus delivers asynchronously — [[await]] polls with a
    * deadline (tests and batch jobs alike should use it rather than
    * reading immediately after the action).
    */
  final class MetricsTap(spark: SparkSession) extends AutoCloseable {
    private val seen = TrieMap.empty[String, Row]

    private val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (k, v) => seen.put(k, v) }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)

    /** Latest observed row for `name`, if any execution carried it. */
    def metrics(name: String): Option[Row] = seen.get(name)

    /** Poll until `name` shows up or the deadline passes. */
    def await(name: String, timeoutMs: Long = 10000L): Option[Row] = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      var out = metrics(name)
      while (out.isEmpty && System.nanoTime() < deadline) {
        Thread.sleep(25L)
        out = metrics(name)
      }
      out
    }

    override def close(): Unit =
      spark.listenerManager.unregister(listener)
  }
}
