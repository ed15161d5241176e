package graft.tools

import org.apache.spark.sql.SparkSession

/** The shared rep-hygiene calibration probe: a fixed cpu-bound
  * workload timed before every bench rep / probe multiplier, so each
  * recorded number carries machine-state evidence (external load shows
  * up as a raised calib reading — see PERF.md §rep-hygiene). One
  * definition so Bench and every ScaleProbe read the SAME workload and
  * their calib lines stay comparable.
  */
object Calibration {

  /** One timed probe run, in seconds. Call once up-front to absorb
    * codegen compile cost before trusting readings.
    */
  def probe(spark: SparkSession): Double = {
    System.gc()
    val t0 = System.nanoTime()
    // bit_xor, not sum: summing 20M full-range xxhash64 values
    // overflows a long under ANSI arithmetic
    spark.range(0L, 20_000_000L, 1L, 32)
      .selectExpr("bit_xor(xxhash64(id))").collect()
    (System.nanoTime() - t0) / 1e9
  }
}
