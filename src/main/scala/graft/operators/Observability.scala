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
    // keyed by name, VALUED by every (executionId, row) that carried the
    // name: two executions observing the same name (a retry, a rerun, a
    // concurrent pipeline) must not overwrite each other — last-writer-
    // wins here returned the WRONG execution's audit row
    private val seen = TrieMap.empty[String, Vector[(Long, Row)]]

    private val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (k, v) =>
          seen.updateWith(k) {
            case Some(rows) if rows.exists(_._1 == qe.id) => Some(rows)
            case Some(rows) => Some(rows :+ (qe.id, v))
            case None => Some(Vector((qe.id, v)))
          }
        }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)

    /** Latest observed row for `name`, if any execution carried it.
      * With several executions observing the same name, prefer
      * [[history]] and correlate by execution.
      */
    def metrics(name: String): Option[Row] =
      seen.get(name).flatMap(_.lastOption).map(_._2)

    /** Every captured (executionId, row) for `name`, arrival order. */
    def history(name: String): Seq[(Long, Row)] =
      seen.get(name).getOrElse(Vector.empty)

    /** Poll until ≥ `minCount` executions carrying `name` have completed
      * (or the deadline passes); returns the latest row.
      */
    def await(name: String, timeoutMs: Long = 10000L,
              minCount: Int = 1): Option[Row] = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (history(name).size < minCount && System.nanoTime() < deadline)
        Thread.sleep(25L)
      if (history(name).size < minCount) None else metrics(name)
    }

    override def close(): Unit =
      spark.listenerManager.unregister(listener)
  }
}
