package graft.tools

/** Scale-growth check for the round-5 text/LM/pair additions: wall
  * time at sf0.01 vs sf0.1 (10× rows). Sub-linear-to-linear ratios
  * confirm the vocab-bounded-model / df-capped-posting claims; a
  * super-linear ratio would mean a pair build or model table is
  * growing with the corpus after all.
  */
object TextScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // q_prefix_filter_pairs / q_dedup_ablation: the exact-pair
    // ground-truth tier. Expected growth is the Σ prefix-posting²
    // model — near-linear while prefix postings stay short (the
    // df-ascending order keeps common shingles OUT of prefixes), so a
    // ~10× ratio at 10× rows confirms the sampled-slice economics the
    // 100 TB contract states; quadratic growth would mean a prefix
    // posting list is corpus-sized after all.
    val defaults = Seq("q_dup_ngram_coverage", "q_bigram_lm_score",
      "q_tfidf_pairs", "q_rolling_active", "q_event_transitions",
      "q_prefix_filter_pairs", "q_dedup_ablation")
    // args override the default list (comma-separated) so a round can
    // probe just its new queries without re-pricing the whole set
    val names =
      if (args.nonEmpty) args(0).split(",").toSeq.filter(_.nonEmpty)
      else defaults
    for (name <- names) {
      val ts = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").map { sf =>
        val warm = (1 to 2).map { _ =>
          graft.CacheRegistry.releaseAll()
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, sf).count()
          (System.nanoTime() - t0) / 1e9
        }
        warm.min
      }
      println(f"TEXTSCALE $name sf0.01=${ts(0)}%.2f sf0.1=${ts(1)}%.2f ratio=${ts(1) / ts(0)}%.1f")
    }
    spark.stop()
  }
}
