package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.VectorQueries

/** Measures the flat-argmin vs two-level-descent assignment crossover
  * THROUGH the extrapolated cross point (PERF.md pinned
  * TWO_LEVEL_MIN_CELLS = 3·10⁵ from marginals fitted on C ≤ 40k —
  * round-14 verdict asked for a direct record bracketing the cross).
  *
  * Both the rows and the centroid ladder are SYNTHESIZED (deterministic
  * xxhash64-mixed dim-64 float vectors), because no local corpus
  * yields 10⁶ distinct centroids; the assignment kernels under test
  * ([[VectorQueries.withCell]] / [[VectorQueries.withCellTwoLevel]])
  * are the library paths byte-for-byte. Row count is fixed at 40k —
  * the same n as PERF.md's C ≤ 40k table, so the two records splice.
  *
  * Cost model being tested: flat = n·C native l2_sq evals (plus a
  * per-row temp array of C structs — the allocation term is part of
  * the honest cost); descent = n·(C/fanout + probeGroups·fanout)
  * evals plus HOF dispatch. fanout = ⌊√C⌋ minimizes the descent's
  * eval term.
  *
  * Env: SPARK_GRAFT_CELLS (csv ladder), SPARK_GRAFT_ROWS.
  */
object IvfCrossoverProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nRows = sys.env.getOrElse("SPARK_GRAFT_ROWS", "40000").toLong
    val ladder = sys.env.getOrElse("SPARK_GRAFT_CELLS",
        "40000,100000,200000,300000,500000,1000000")
      .split(",").map(_.trim.toLong).toSeq
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic dim-64 float vectors from an id column
    def vecs(n: Long, idName: String) =
      spark.range(n).select(col("id").as(idName),
        transform(sequence(lit(1), lit(64)), j =>
          (pmod(xxhash64(col("id") * 64 + j), lit(1000)).cast("float")
            / lit(100.0f))).as("embedding"))

    val rows = vecs(nRows, "vec_id").repartition(cpus.toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rows.count()

    def time(label: String)(f: => Long): Unit = {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val n = f
      println(f"[ivfcross] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    for (c <- ladder) {
      val cents = vecs(c, "cell")
        .select(col("cell"), col("embedding").as("centroid"))
      val fanout = math.max(8, math.sqrt(c.toDouble).toInt)
      time(s"assign flat $c cells")(
        VectorQueries.withCell(rows,
          VectorQueries.centroidArray(cents), col("embedding")).count())
      time(s"assign 2-level $c cells f=$fanout")(
        VectorQueries.withCellTwoLevel(rows, cents, col("embedding"),
          fanout = fanout, probeGroups = 2).count())
    }
    spark.stop()
  }
}
