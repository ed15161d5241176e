package graft.tools

import graft.operators.VectorQueries

/** Times the PQ family per stage at both SFs — encode cost is the
  * suspect (nested HOF argmin is interpreted, not codegen'd).
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.newSession(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PQPROBE $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      println(s"== $sf")
      time("pq_topk")(VectorQueries.queries("q_ann_pq_topk")(spark, sf).count())
      time("ivfpq_topk")(VectorQueries.queries("q_ann_ivfpq_topk")(spark, sf).count())
    }
    spark.stop()
  }
}
