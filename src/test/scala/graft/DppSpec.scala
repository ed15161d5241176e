package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning on a date-partitioned fact: the 100 TB
  * layout contract. A filter that reaches the DIMENSION side only at
  * runtime must still prune the fact's partition directories — Spark
  * plants a DynamicPruningExpression subquery into the scan's
  * partition filters when the join key is a partition column and the
  * dim side is broadcast. Without DPP, every "facts for the selected
  * days" query scans the whole fact table.
  */
class DppSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_dpp_").toString
    eventsWithMs("/root/testdata/sf0.001/events.parquet")
      .withColumn("day", expr("ms div 86400000")).drop("ms")
      .write.mode("overwrite").partitionBy("day").parquet(d)
    d
  }

  test("join through a filtered dim plants a dynamic pruning subquery") {
    val fact = spark.read.parquet(dir)
    // partition-directory columns come back as INT for day-sized
    // values; the dim's key must match EXACTLY — a cast on the join
    // key un-anchors it from the partition column and silently
    // disables DPP (this spec exists to catch that regression)
    val allDays = fact.select("day").distinct()
      .as[Int].collect().sorted
    assert(allDays.length > 3) // pruning must have something to prune
    val keep = allDays.take(2).toSet
    // the keep/skip TAG is dim-side data, invisible to static pruning.
    // The dim must be a REAL table (file scan): a local relation's
    // filter constant-folds away before planning, and with no
    // selective predicate left on the dim DPP has nothing to plant.
    val dimDir = Files.createTempDirectory("graft_dpp_dim_").toString
    allDays.map(d => (d, if (keep(d)) "keep" else "skip")).toSeq
      .toDF("day", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim.filter(col("tag") === "keep"), "day")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning subquery in:\n$plan")
    // and the pruned result is still exactly the kept days' rows
    val expected = fact.filter(col("day").isin(keep.toSeq: _*)).count()
    assert(joined.count() === expected)
    assert(expected > 0)
  }

  test("static partition filters still prune without a join") {
    val fact = spark.read.parquet(dir)
    val day0 = fact.select(min("day")).as[Int].collect().head
    val q = fact.filter(col("day") === day0)
    val scan = q.queryExecution.executedPlan.toString
    // partition filter present; no pushed data filter needed for `day`
    assert(scan.contains("PartitionFilters"))
    assert(q.count() > 0)
  }
}
