package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables
import graft.operators.Dedup

/** Dev-only: phase timing for q_jaccard_pairs under bench conf. */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = Tables.load(spark, dir, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    // mirror of the one-pass jaccardPairs structure, stage by stage
    val maxDf = 100
    val raw = Dedup.docShingles(docs, "doc_id", "text", 3)
      .select(col("doc_id"), Dedup.shingleHash(col("shingle")).as("shingle"))
    time("0 raw pairs (no cache)")(raw.count())
    val grouped = raw
      .groupBy("shingle")
      .agg(count(lit(1)).as("df_count"),
        expr(s"bounded_topk(cast(doc_id as double), doc_id, ${maxDf + 1})")
          .as("top"))
      .filter(col("df_count") <= maxDf)
      .select(transform(col("top"), t => t.getField("n")).as("ids"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("1 grouped fill")(grouped.count())
    time("2 sizes")(grouped.select(explode(col("ids")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("sz")).count())
    val combos = flatten(transform(col("ids"), (a, i) =>
      transform(slice(col("ids"), i + lit(2), size(col("ids"))),
        b => struct(a.as("a"), b.as("b")))))
    val common = grouped.filter(size(col("ids")) >= 2)
      .select(explode(combos).as("p"))
      .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    time("3 combos+paircount")(common.count())
    grouped.unpersist(blocking = true)
    time("4 full query fresh")(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 100, 60).count())
    graft.CacheRegistry.releaseAll()
    time("5 full query again")(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 100, 60).count())
    spark.stop()
  }
}
