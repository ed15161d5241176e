package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Calibration, CountMin, Curation, ZOrder}

/** Semantic invariants of the round-11 sketch/evaluation tier —
  * the guarantees the operators CLAIM, asserted on real testdata
  * (the hash gate proves engine agreement; these prove the math).
  */
class SketchEvalSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("q_cms_estimate: CMS point estimates are one-sided (est ≥ exact)") {
    val rows = CountMin.queries("q_cms_estimate")(spark, sf).collect()
    assert(rows.length === CountMin.PROBE_K)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_count")
      val est = r.getAs[Long]("est_count")
      assert(est >= exact, s"CMS undercount at ${r.getAs[String]("token")}")
      assert(r.getAs[Long]("overcount") === est - exact)
    }
  }

  test("q_cms_join_size: inner-product estimate is one-sided and close") {
    val r = CountMin.queries("q_cms_join_size")(spark, sf).collect()(0)
    val exact = r.getAs[Long]("exact_pairs")
    val est = r.getAs[Long]("est_pairs")
    assert(est >= exact, "CMS join-size undercount")
    // width 1024 over ~1e4 users: collisions stay a bounded fraction
    assert(r.getAs[Long]("over_ppm") < 500000L,
      s"join-size overcount above 50 %: ${r.getAs[Long]("over_ppm")} ppm")
  }

  test("q_calibration_ece: bins partition the corpus; ECE is the " +
    "n-weighted mean gap") {
    val rows = Calibration.queries("q_calibration_ece")(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum === nDocs)
    val ece = rows.head.getAs[Long]("ece_pm")
    assert(rows.forall(_.getAs[Long]("ece_pm") === ece))
    // recompute from per-bin untruncated components: Σ n·gap within
    // one truncation of ece·N (per-bin gap_pm is itself truncated)
    val approx = rows.map(r => r.getAs[Long]("n") * r.getAs[Long]("gap_pm"))
      .sum
    assert(approx <= ece * nDocs + nDocs &&
      approx >= (ece - 1) * nDocs - nDocs)
  }

  test("q_conformal_coverage: held-out coverage honors the 1−α target") {
    val r = Calibration.queries("q_conformal_coverage")(spark, sf)
      .collect()(0)
    assert(r.getAs[Long]("n_cal") > 0 && r.getAs[Long]("n_test") > 0)
    // marginal guarantee is ≥ 900000 in expectation; the realized
    // coverage on this fixed split sits above 850000 with margin
    assert(r.getAs[Long]("coverage_ppm") >= 850000L,
      s"coverage ${r.getAs[Long]("coverage_ppm")} ppm below target band")
  }

  test("q_dup_aware_sample: singleton clusters always survive; kept " +
    "never exceeds docs") {
    val rows = Curation.queries("q_dup_aware_sample")(spark, sf).collect()
    rows.foreach { r =>
      val (docs, clusters, kept) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_clusters"), r.getAs[Long]("n_kept"))
      assert(kept <= docs)
      if (clusters === docs) assert(kept === docs,
        s"dropped a singleton in ${r.getAs[String]("source")}")
    }
  }

  test("q_zone_pruning: the z-layout prunes strictly better than " +
    "insertion order") {
    val rows = ZOrder.queries("q_zone_pruning")(spark, sf).collect()
      .map(r => r.getAs[String]("layout") ->
        r.getAs[Long]("scanned_share_bp")).toMap
    assert(rows("zorder") < rows("linear"),
      s"z-order share ${rows("zorder")} !< linear ${rows("linear")}")
    // the point of the layout: an order-of-magnitude, not a shave
    assert(rows("zorder") * 10 <= rows("linear"))
  }

  test("q_ht_estimate: HT reweighting is EXACT on an all-singleton " +
    "corpus") {
    val r = Curation.queries("q_ht_estimate")(spark, sf).collect()(0)
    // sf0.01 has no exact dups (all inclusion probs = 1): the
    // Horvitz–Thompson estimate must equal the corpus total exactly
    if (r.getAs[Long]("n_kept") === r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("err_bp") === 0L,
        s"HT err ${r.getAs[Long]("err_bp")} bp on a fully-kept corpus")
    assert(r.getAs[Long]("est_chars") >= 0L)
  }

  test("q_conformal_group: +∞-threshold groups are fully covered; " +
    "quantile groups honor the band") {
    val rows = Calibration.queries("q_conformal_group")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (r.isNullAt(r.fieldIndex("threshold")))
        assert(r.getAs[Long]("coverage_ppm") === 1000000L,
          s"${r.getAs[String]("lang")}: +∞ threshold must cover all")
      else
        assert(r.getAs[Long]("coverage_ppm") >= 800000L,
          s"${r.getAs[String]("lang")}: group coverage below band")
    }
  }

  test("q_stream_cms: the incremental sketch's inner-product estimate " +
    "equals the batch q_cms_join_size estimate") {
    import graft.streaming.StreamGateQueries
    val streamIp = StreamGateQueries.queries("q_stream_cms")(spark, sf)
      .collect().map(_.getAs[Long]("ip_est")).min
    val batchEst = CountMin.queries("q_cms_join_size")(spark, sf)
      .collect()(0).getAs[Long]("est_pairs")
    assert(streamIp === batchEst,
      s"incremental CMS $streamIp != batch $batchEst")
  }

  test("dyadicCover: disjoint aligned blocks that tile exactly [a, b]") {
    for ((a, b) <- Seq((0L, 0L), (5L, 5L), (3L, 17L), (8L, 15L),
      (CountMin.RANGE_LO_MIN, CountMin.RANGE_HI_MIN))) {
      val cover = CountMin.dyadicCover(a, b)
      cover.foreach { case (l, j) =>
        assert(l >= 0 && l < CountMin.RANGE_LEVELS)
        assert(j << l >= a && ((j + 1L) << l) - 1 <= b,
          s"block ($l,$j) escapes [$a,$b]")
      }
      // blocks tile the range exactly: sizes sum and no overlaps
      val points = cover.flatMap { case (l, j) =>
        (j << l) until ((j + 1L) << l) }
      assert(points.distinct.size === points.size, "overlapping blocks")
      assert(points.size === (b - a + 1), s"cover of [$a,$b] mis-sized")
    }
  }

  test("q_cms_range: dyadic estimate is one-sided and interval count " +
    "matches the canonical cover") {
    val r = CountMin.queries("q_cms_range")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_intervals") ===
      CountMin.dyadicCover(CountMin.RANGE_LO_MIN,
        CountMin.RANGE_HI_MIN).size.toLong)
    assert(r.getAs[Long]("est_range") >= r.getAs[Long]("exact_range"),
      "dyadic CMS undercount")
  }

  test("q_kmv_range: merged cover sketch is EXACT below k and within " +
    "the k=256 band above it") {
    import graft.operators.Sketches
    val r = Sketches.queries("q_kmv_range")(spark, sf).collect()(0)
    val (exact, est) = (r.getAs[Long]("exact_distinct"),
      r.getAs[Long]("est_distinct"))
    if (exact < 256) assert(est === exact,
      "below-k merged sketch must be the exact answer")
    assert(r.getAs[Int]("within_15pct") === 1)
  }

  test("q_embargo_split: the three bands partition the event log; " +
    "leaky users bound by both sides") {
    import graft.operators.EventQueries
    val r = EventQueries.queries("q_embargo_split")(spark, sf).collect()(0)
    val total = spark.read.parquet(s"$sf/events.parquet").count()
    assert(r.getAs[Long]("n_train_events") +
      r.getAs[Long]("n_embargo_events") +
      r.getAs[Long]("n_test_events") === total)
    assert(r.getAs[Long]("n_leaky_users") <=
      math.min(r.getAs[Long]("n_train_users"),
        r.getAs[Long]("n_test_users")))
  }

  test("q_stream_zone_maps: incremental ingest state equals the batch " +
    "zone-map derivation") {
    import graft.operators.RelationalQueries
    import graft.streaming.StreamGateQueries
    val streamed = StreamGateQueries.queries("q_stream_zone_maps")(
      spark, sf)
    val batch = RelationalQueries.queries("q_zorder_layout")(spark, sf)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty,
      "streaming zone maps diverge from the batch layout stats")
  }

  test("q_cms_estimate: probes ride TakeOrdered, sketch plan is " +
    "window-free") {
    val plan = CountMin.queries("q_cms_estimate")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
  }
}
