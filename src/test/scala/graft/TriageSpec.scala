package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, EventQueries, RelationalQueries, TextQueries}

/** Independent-recomputation checks for the triage signals: blocked
  * edit-distance pairs, corpus-rarity scores, and z-score outliers are
  * re-derived driver-side from the raw sf0.001 rows (plain Scala, no
  * Spark expressions) and compared to the distributed answers exactly.
  */
class TriageSpec extends AnyFunSuite with SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def lowerAscii(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT)

  test("q_edit_distance_pairs ≡ driver-side blocked levenshtein") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    val expected = (for {
      (ia, la, ta) <- docs; (ib, lb, tb) <- docs
      if ia < ib && la == lb && ta.length / 64 == tb.length / 64
      d = lev(lowerAscii(ta.take(80)), lowerAscii(tb.take(80)))
      if d <= 10
    } yield (ia, ib, d.toLong)).toSet
    val got = TextQueries.queries("q_edit_distance_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty) // the corpus does contain near-identical prefixes
  }

  test("q_rarity_score ≡ driver-side integer recomputation") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        lowerAscii(r.getString(1)).trim.split("\\s+").toSeq)
      .filter(_._2.exists(_.nonEmpty))
    val counts = toks.flatMap(_._2).groupBy(identity).map {
      case (t, xs) => t -> xs.size.toLong
    }
    val total = counts.values.sum
    val expected = toks.map { case (id, ts) =>
      val raw = ts.map(t => total / counts(t)).sum
      (id, ts.size.toLong, raw / ts.size)
    }.toSet
    val got = TextQueries.queries("q_rarity_score")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("q_vocab_coverage ≡ driver-side top-V vocab + OOV recount") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        lowerAscii(r.getString(1)).trim.split("\\s+").toSeq)
      .filter(_._2.exists(_.nonEmpty))
    val counts = toks.flatMap(_._2).groupBy(identity).map {
      case (t, xs) => t -> xs.size.toLong
    }
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(10).map(_._1).toSet
    val expected = toks.map { case (id, ts) =>
      val oov = ts.count(!vocab.contains(_)).toLong
      (id, ts.size.toLong, oov, oov * 10000 / ts.size)
    }.toSet
    val got = TextQueries.queries("q_vocab_coverage")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)
  }

  test("q_rate_anomaly flags exactly the >2σ traffic hours") {
    val hourly = eventsWithMs(s"$sf/events.parquet")
      .selectExpr("(ms div 3600000) * 3600000 AS h",
        "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val stats = hourly.groupBy(_._1._2).map { case (t, m) =>
      val cs = m.values
      t -> ((cs.size.toLong, cs.sum, cs.map(c => c * c).sum))
    }
    val expected = hourly.collect {
      case ((h, t), c) if {
        val (n, s, q) = stats(t); val d = c * n - s
        d * d > 4 * (n * q - s * s)
      } => (h, t, c)
    }.toSet
    val got = EventQueries.queries("q_rate_anomaly")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got === expected)
  }

  test("q_interval_overlap ≡ driver-side same-customer window overlap") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey",
        "CAST(CAST(o_orderdate AS DATE) AS STRING) AS d").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.time.LocalDate.parse(r.getString(2))))
    val expected = (for {
      (ka, ca, da) <- orders; (kb, cb, db) <- orders
      if ca == cb && ka < kb
      ea = da.plusDays(7); eb = db.plusDays(7)
      if !da.isAfter(eb) && !db.isAfter(ea)
      ov = java.time.temporal.ChronoUnit.DAYS.between(
        if (da.isAfter(db)) da else db,
        if (ea.isBefore(eb)) ea else eb) + 1
    } yield (ca, ka, kb, ov)).toSet
    val got = RelationalQueries.queries("q_interval_overlap")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q_weighted_sample: deterministic, quality-consistent acceptance") {
    val quality = TextQueries.queries("q_quality_score")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"11:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16) % 100
    }
    val expected = quality.collect {
      case (id, q) if bucket(id) < q => (id, q.toLong)
    }.toSet
    val got = Curation.queries("q_weighted_sample")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong)).toSet
    assert(got === expected)
    assert(got.nonEmpty && got.size < quality.size) // a real subsample
  }

  test("q_winsorized_stats ≡ driver-side exact-quantile clip") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_type", "CAST(floor(value) AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).map { case (t, rows) =>
      val vs = rows.map(_._2).sorted
      val n = vs.length
      // smallest v whose cumulative count reaches 5 % / 95 %
      def q(p20: Int): Long = {
        var cum = 0L
        vs.map { v => cum += 1; (v, cum) }
          .collectFirst { case (v, c) if c * 20 >= n.toLong * p20 => v }.get
      }
      val (lo, hi) = (q(1), q(19))
      (t, n.toLong, lo, hi,
        vs.map(v => math.max(lo, math.min(hi, v))).sum)
    }.toSet
    val got = EventQueries.queries("q_winsorized_stats")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === expected)
  }

  test("q_conversion_lag ≡ driver-side first-view→first-purchase buckets") {
    val ev = eventsWithMs(s"$sf/events.parquet")
      .selectExpr("user_id", "event_type", "ms")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.filter(e => e._2 == "view" || e._2 == "purchase")
      .groupBy(_._1)
    val expected = byUser.flatMap { case (_, rows) =>
      val views = rows.filter(_._2 == "view").map(_._3)
      val purchases = rows.filter(_._2 == "purchase").map(_._3)
      for {
        fv <- views.sorted.headOption; fp <- purchases.sorted.headOption
        if fp >= fv
      } yield (fp - fv) / 3600000L
    }.groupBy(identity).map { case (h, xs) => (h, xs.size.toLong) }.toSet
    val got = EventQueries.queries("q_conversion_lag")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q_quality_percentile ≡ cume_dist in basis points over quality") {
    val q = TextQueries.queries("q_quality_score")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val n = q.length.toLong
    val cum = q.map(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
      .scanLeft((Int.MinValue, 0L)) { case ((_, acc), (v, c)) =>
        (v, acc + c)
      }.drop(1).toMap
    val expected = q.map { case (id, v) =>
      (id, v.toLong, cum(v) * 10000 / n)
    }.toSet
    val got = TextQueries.queries("q_quality_percentile")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
      .toSet
    assert(got === expected)
  }

  test("q_incremental_dedup verdicts ≡ fingerprints + verified pairs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"7:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(4).map("%02x".format(_)).mkString, 16) % 100
    }
    def fp(text: String): String = {
      val norm = text.trim.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("\\s+", " ")
      java.security.MessageDigest.getInstance("MD5")
        .digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val batch = docs.keySet.filter(bucket(_) >= 90)
    val corpus = docs.keySet -- batch
    val corpusFps = corpus.map(id => fp(docs(id)))
    // near-dup edges from the (independently oracle-checked) LSH query
    val pairs = TextQueries.queries("q_lsh_verified_dups")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nearToCorpus = pairs.flatMap { case (a, b) =>
      Seq(a -> b, b -> a)
    }.collect { case (x, other) if corpus.contains(other) => x }.toSet
    val expected = batch.map { id =>
      id -> (if (corpusFps.contains(fp(docs(id)))) "exact_dup"
             else if (nearToCorpus.contains(id)) "near_dup"
             else "new")
    }.toMap
    val got = TextQueries.queries("q_incremental_dedup")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q_skyline ≡ driver-side NOT-EXISTS frontier") {
    val lang = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val quality = TextQueries.queries("q_quality_score")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val toks = TextQueries.queries("q_text_stats")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Number]("n_tokens").longValue)
      .toMap
    val pc = quality.keys.toSeq
      .map(id => (lang(id), quality(id), toks(id)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = pc.keySet.filter { case (l, q, t) =>
      !pc.keySet.exists { case (l2, q2, t2) =>
        l2 == l && q2 >= q && t2 >= t && (q2 > q || t2 > t)
      }
    }.map { case k @ (l, q, t) => (l, q, t, pc(k)) }
    val got = TextQueries.queries("q_skyline")(spark, sf)
      .collect().map(r => (r.getString(0),
        r.getAs[Number](1).longValue, r.getAs[Number](2).longValue,
        r.getLong(3))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q_mixture_weights ≡ driver-side allocator; budget respected") {
    val srcOf = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val toks = TextQueries.queries("q_text_stats")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Number]("n_tokens").longValue)
      .toMap
    val perSrc = srcOf.keys.toSeq.groupBy(srcOf)
      .view.mapValues(ids => (ids.size.toLong, ids.map(toks).sum))
      .toMap.filter(_._2._2 > 0)
    val totalTokens = perSrc.values.map(_._2).sum
    val nSources = perSrc.size.toLong
    val expected = perSrc.map { case (src, (nDocs, nToks)) =>
      val epochs =
        math.min(4000L, (totalTokens / 2 / nSources) * 1000 / nToks)
      (src, nDocs, nToks, nToks * 10000 / totalTokens, epochs,
        nToks * epochs / 1000)
    }.toSet
    val got = Curation.queries("q_mixture_weights")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got === expected)
    // allocator invariant: no source exceeds the repetition cap, and
    // planned volume never exceeds its equal share by more than the
    // one-token integer-division slack
    val target = totalTokens / 2 / nSources
    for ((_, _, _, _, ep, planned) <- got) {
      assert(ep <= 4000L)
      assert(planned <= target + 1000)
    }
  }

  test("q_dup_ngram_coverage ≡ driver-side shared-shingle recount") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val gramsOf = docs.collect { case (id, text)
        if lowerAscii(text).trim.split("\\s+").count(_.nonEmpty) >= 3 =>
      id -> lowerAscii(text).trim.split("\\s+").filter(_.nonEmpty)
        .sliding(3).map(_.mkString(" ")).toSet
    }.toMap
    val df = gramsOf.values.flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = gramsOf.map { case (id, grams) =>
      val shared = grams.count(g => df(g) >= 2).toLong
      (id, grams.size.toLong, shared, shared * 10000 / grams.size)
    }.toSet
    val got = TextQueries.queries("q_dup_ngram_coverage")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === expected)
    assert(got.exists(_._4 > 0)) // the corpus has cross-doc overlap
  }

  test("q_bigram_lm_score ≡ driver-side bigram-surprisal recount") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val bigramsOf = docs.collect { case (id, text)
        if lowerAscii(text).trim.split("\\s+").count(_.nonEmpty) >= 2 =>
      val t = lowerAscii(text).trim.split("\\s+").filter(_.nonEmpty)
      id -> t.sliding(2).map(p => (p(0), p.mkString(" "))).toSeq
    }.toMap
    val all = bigramsOf.values.flatten.toSeq
    val nPair = all.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nCtx = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expected = bigramsOf.map { case (id, bgs) =>
      val sups = bgs.map { case (w1, p) => nCtx(w1) * 1000000L / nPair(p) }
      (id, bgs.size.toLong, sups.sum, sups.sum / bgs.size)
    }.toSet
    val got = TextQueries.queries("q_bigram_lm_score")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q_head_coverage ≡ driver-side Zipf recount") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().flatMap(r =>
        lowerAscii(r.getString(0)).trim.split("\\s+").filter(_.nonEmpty))
    val freq = toks.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy { case (t, n) => (-n, t) }
    val total = toks.length.toLong
    val cums = freq.scanLeft(0L)(_ + _._2).drop(1)
    val expected = Seq(1, 2, 5, 10, 20, 50)
      .filter(_ <= freq.size)
      .map(k => (k.toLong, cums(k - 1), cums(k - 1) * 10000 / total))
      .toSet
    val got = TextQueries.queries("q_head_coverage")(spark, sf)
      .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1),
        r.getLong(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q_ngram_novelty ≡ driver-side first-introducer recount") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val gramsOf = docs.collect { case (id, text)
        if lowerAscii(text).trim.split("\\s+").count(_.nonEmpty) >= 3 =>
      id -> lowerAscii(text).trim.split("\\s+").filter(_.nonEmpty)
        .sliding(3).map(_.mkString(" ")).toSet
    }.toMap
    val firstOf = gramsOf.toSeq.flatMap { case (id, gs) =>
      gs.map(_ -> id)
    }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = gramsOf.map { case (id, gs) =>
      val novel = gs.count(g => firstOf(g) == id).toLong
      (id, gs.size.toLong, novel, novel * 10000 / gs.size)
    }.toSet
    val got = TextQueries.queries("q_ngram_novelty")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === expected)
    // the earliest doc is all-novel; later exact dups are all-stale
    assert(got.exists(_._4 == 10000L) && got.exists(_._4 == 0L))
  }

  test("q_dup_rate_by_source ≡ driver-side fingerprint recount") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def fp(text: String): String = {
      val norm = lowerAscii(text).trim.replaceAll("\\s+", " ")
      java.security.MessageDigest.getInstance("MD5")
        .digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val fpCount = rows.map(r => fp(r._2))
      .groupBy(identity).view.mapValues(_.size).toMap
    val expected = rows.groupBy(_._1).map { case (src, rs) =>
      val dup = rs.count(r => fpCount(fp(r._2)) >= 2).toLong
      (src, rs.size.toLong, dup, dup * 10000 / rs.size)
    }.toSet
    val got = TextQueries.queries("q_dup_rate_by_source")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === expected)
    // sf0.001 has no planted exact dups — the recount equality above is
    // the check; just pin that every source is present
    assert(got.toSeq.map(_._2).sum === rows.length.toLong)
  }

  test("q_event_paths ≡ driver-side 3-gram path recount") {
    val ev = eventsWithMs(s"$sf/events.parquet")
      .selectExpr("user_id", "event_id", "event_type",
        "ms").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val expected = ev.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(e => (e._4, e._2)).map(_._3).sliding(3)
        .filter(_.length == 3).map(_.mkString(">"))
    }.toSeq.groupBy(identity).map { case (p, xs) =>
      (p, xs.size.toLong)
    }.toSet
    val got = operators.EventQueries.queries("q_event_paths")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q_arrival_histogram ≡ driver-side gap recount") {
    val ev = eventsWithMs(s"$sf/events.parquet")
      .selectExpr("event_id", "event_type", "ms")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = ev.groupBy(_._2).toSeq.flatMap { case (t, rows) =>
      val sorted = rows.sortBy(e => (e._3, e._1)).map(_._3).toSeq
      sorted.zip(sorted.tail).map { case (a, b) =>
        (t, math.min((b - a) / 60000, 60L))
      }
    }.groupBy(x => x).map { case ((t, b), xs) =>
      (t, b, xs.size.toLong)
    }.toSet
    val got = operators.EventQueries
      .queries("q_arrival_histogram")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q_outliers flags exactly the integer-z² > 4 events") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "event_type",
        "CAST(floor(value) AS BIGINT) AS v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byType = ev.groupBy(_._2)
    val stats = byType.map { case (t, rows) =>
      val n = rows.size.toLong
      val s = rows.map(_._3).sum
      val q = rows.map(r => r._3 * r._3).sum
      t -> ((n, s, q))
    }
    val expected = ev.filter { case (_, t, v) =>
      val (n, s, q) = stats(t)
      val d = v * n - s
      d * d > 4 * (n * q - s * s)
    }.map(_._1).toSet
    val got = EventQueries.queries("q_outliers")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got === expected)
    assert(got.nonEmpty) // right-skewed values ⇒ a >2σ tail exists
  }

  test("q_mad_outliers ≡ driver-side median/MAD recount") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_type", "CAST(floor(value) AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // exact lower median: smallest value with 2·cum ≥ n
    def lowerMedian(vs: Seq[Long]): Long = {
      val sorted = vs.sorted
      val n = sorted.length
      sorted.zipWithIndex
        .collectFirst { case (v, i) if (i + 1) * 2 >= n => v }.get
    }
    val expected = ev.groupBy(_._1).map { case (t, rows) =>
      val vs = rows.map(_._2).toSeq
      val med = lowerMedian(vs)
      val mad = lowerMedian(vs.map(v => math.abs(v - med)))
      (t, vs.length.toLong, med, mad,
        vs.count(v => math.abs(v - med) > mad * 3).toLong)
    }.toSet
    val got = EventQueries.queries("q_mad_outliers")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === expected)
    // the skewed value distribution must flag a tail somewhere
    assert(got.exists(_._5 > 0))
  }

  test("q_padding_waste ≡ driver-side token-count recount") {
    val ctx = 48L
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map { r =>
        val t = r.getString(0).trim
        if (t.isEmpty) 0L else t.split("\\s+").length.toLong
      }
    val nDocs = toks.length.toLong
    val total = toks.sum
    val usable = toks.map(math.min(_, ctx)).sum
    val pad = toks.map(t => math.max(ctx - t, 0L)).sum
    val trunc = toks.map(t => math.max(t - ctx, 0L)).sum
    val packedSeqs = (total + ctx - 1) / ctx
    val r = Curation.queries("q_padding_waste")(spark, sf).collect().head
    assert(r.getAs[Long]("n_docs") === nDocs)
    assert(r.getAs[Long]("total_tokens") === total)
    assert(r.getAs[Long]("usable_tokens") === usable)
    assert(r.getAs[Long]("pad_tokens") === pad)
    assert(r.getAs[Long]("trunc_tokens") === trunc)
    assert(r.getAs[Long]("padded_util_bp") ===
      usable * 10000 / (nDocs * ctx))
    assert(r.getAs[Long]("packed_seqs") === packedSeqs)
    assert(r.getAs[Long]("packed_util_bp") ===
      total * 10000 / (packedSeqs * ctx))
    // packing must strictly beat pad-per-doc on this corpus
    assert(r.getAs[Long]("packed_util_bp") > r.getAs[Long]("padded_util_bp"))
  }
}
