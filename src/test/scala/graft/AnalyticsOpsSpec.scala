package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Association, Experiments, Hierarchy, Lifecycle, Privacy, Search, SqlSurface, TextRank}

/** Driver-side re-derivations of the hierarchy / association /
  * experiment-health / TextRank operators against the sf0.001 tables:
  * each invariant is recomputed in plain Scala from collected raw rows
  * (no Spark expressions), so an engine-side regression cannot hide in
  * a shared formula. The DuckDB hash gate covers exact values; these
  * specs pin the semantic contracts the gate can't phrase (pointer
  * doubling ≡ sequential walk, rank bounds, renormalizing comb, score
  * floors).
  */
class AnalyticsOpsSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q_hierarchy_closure: pointer doubling ≡ sequential parent walk") {
    val rows = Hierarchy.queries("q_hierarchy_closure")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val ids = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").cast("long")).collect().map(_.getLong(0))
    assert(rows.keySet === ids.toSet)
    ids.foreach { id =>
      var cur = id; var d = 0L
      while (cur >= 10) { cur = cur / 10; d += 1 } // sequential walk
      assert(rows(id) === ((cur, d)), s"node $id")
    }
  }

  test("q_subtree_rollup: counts/depths match brute-force ancestor sets") {
    val got = Hierarchy.queries("q_subtree_rollup")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3))))
      .toMap
    val ids = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").cast("long")).collect().map(_.getLong(0))
    val exp = scala.collection.mutable.Map[Long, (Long, Long)]()
    ids.foreach { id =>
      var cur = id; var d = 0L
      while (cur >= 10) {
        cur = cur / 10; d += 1
        val (n, md) = exp.getOrElse(cur, (0L, 0L))
        exp(cur) = (n + 1, math.max(md, d))
      }
    }
    assert(got === exp.toMap)
  }

  test("q_basket_rules: supports/confidence match brute-force recount") {
    val rules = Association.queries("q_basket_rules")(spark, sf).collect()
    val items = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val baskets = items.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val itemN = items.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairN = scala.collection.mutable.Map[(Long, Long), Long]()
    baskets.values.foreach { b =>
      val v = b.toSeq.sorted
      for (i <- v.indices; j <- i + 1 until v.length)
        pairN((v(i), v(j))) = pairN.getOrElse((v(i), v(j)), 0L) + 1
    }
    assert(rules.nonEmpty && rules.length <= 100)
    // rows arrive in the declared (support desc, ant, cons) order
    val order = rules.map(r => (-r.getLong(2), r.getLong(0), r.getLong(1)))
    assert(order.sameElements(order.sorted))
    rules.foreach { r =>
      val (ant, cons) = (r.getLong(0), r.getLong(1))
      val nPair = r.getLong(2)
      assert(nPair === pairN((ant, cons)), s"pair ($ant,$cons)")
      assert(r.getLong(3) === itemN(ant) && r.getLong(4) === itemN(cons))
      assert(r.getLong(5) === nPair * 10000L / itemN(ant)) // conf_bp
      assert(nPair >= 2 && r.getLong(5) <= 10000L)
    }
  }

  test("q_also_bought: ≤3 ranked co-items per part, support-ordered") {
    val got = Association.queries("q_also_bought")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.groupBy(_._1).foreach { case (pkey, rows) =>
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._4).sameElements(1L to byRank.length))
      // support non-increasing down the ranks; ties broken by co-item key
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2), s"part $pkey")
        case _ =>
      }
    }
  }

  test("q_ab_srm: arms partition the distinct users; χ² recomputes") {
    val r = Experiments.queries("q_ab_srm")(spark, sf).collect().head
    val (nA, nB) = (r.getLong(0), r.getLong(1))
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id")).distinct().count()
    assert(nA + nB === users && nA > 0 && nB > 0)
    val d = nA - nB
    assert(r.getLong(2) === d * d * 1000L / (nA + nB))
    assert(r.getBoolean(3) === (r.getLong(2) >= 3841L))
  }

  test("q_ewma_daily: comb renormalizes on ramp-up and tracks a recompute") {
    val got = Experiments.queries("q_ewma_daily")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.groupBy(_._1).foreach { case (tpe, rows) =>
      val seq = rows.sortBy(_._2)
      seq.indices.foreach { i =>
        val lags = (0 until 10).flatMap { k =>
          if (i - k >= 0) Some((1L << (9 - k)) -> seq(i - k)._3) else None
        }
        val num = lags.map { case (w, n) => w * n }.sum
        val den = lags.map(_._1).sum
        assert(seq(i)._4 === num * 1000L / den, s"$tpe day ${seq(i)._2}")
      }
    }
  }

  test("q_benford: all 9 digits report; shares sum to ~1e6; dev = obs−exp") {
    val rows = Experiments.queries("q_benford")(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted === (1 to 9).map(_.toString))
    val obsSum = rows.map(_.getLong(2)).sum
    assert(obsSum > 1000000L - 9 && obsSum <= 1000000L) // 9 floors
    rows.foreach(r =>
      assert(r.getLong(4) === r.getLong(2) - r.getLong(3)))
  }

  test("q_boolean_search: hits ≡ brute-force set algebra on raw text") {
    val got = Search.queries("q_boolean_search")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val exp = docs.flatMap { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
      if (text.trim.nonEmpty && toks.contains("table") &&
          toks.contains("value") && !toks.contains("slow"))
        Some(id -> ((2L, toks.size.toLong)))
      else None
    }.toMap
    assert(got === exp)
  }

  test("q_phrase_search: occurrence counts ≡ sliding-window recount") {
    val got = Search.queries("q_phrase_search")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val exp = docs.flatMap { case (id, text) =>
      val t = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val hits = t.indices.dropRight(1)
        .filter(i => t(i) == "table" && t(i + 1) == "hash")
      if (hits.nonEmpty) Some(id -> ((hits.length.toLong, hits.head + 1L)))
      else None
    }.toMap
    assert(got === exp)
  }

  test("q_contingency_chi2: statistic recomputes in BigInt from raw joins") {
    val r = Experiments.queries("q_contingency_chi2")(spark, sf)
      .collect().head
    val joined = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderpriority")).collect()
      .map(x => (x.getString(0), x.getString(1)))
    val n = BigInt(joined.length)
    val cells = joined.groupBy(identity).view.mapValues(v => BigInt(v.length))
    val rowN = joined.groupBy(_._1).view.mapValues(v => BigInt(v.length))
    val colN = joined.groupBy(_._2).view.mapValues(v => BigInt(v.length))
    val terms = cells.map { case ((seg, pri), o) =>
      o * o * n * 1000 / (rowN(seg) * colN(pri))
    }.sum
    assert(r.getLong(0) === joined.length)
    assert(r.getLong(1) ===
      (rowN.size.toLong - 1) * (colN.size.toLong - 1))
    assert(BigInt(r.getLong(2)) === terms - n * 1000)
  }

  test("q_power_sample_size: grid recomputes; n shrinks quadratically") {
    val rows = Experiments.queries("q_power_sample_size")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.map(_._1) === Seq(50L, 100L, 200L, 400L))
    val p = rows.head._2
    rows.foreach { case (mde, pBp, n) =>
      assert(pBp === p)
      assert(n === 2L * 784L * p * (10000L - p) / (100L * mde * mde))
    }
    // quadratic shrink: doubling the MDE divides n by ~4 (degenerate
    // p ∈ {0, 10⁴} makes every n zero — sf0.001 has universal
    // conversion — so only assert when the curve is non-trivial)
    rows.sliding(2).foreach { case Array(a, b) =>
      if (b._3 > 0) assert(a._3 / b._3 >= 3 && a._3 / b._3 <= 4)
      else assert(a._3 === 0L)
    case _ => }
  }

  test("q_nelson_aalen: risk sets telescope; hazard recomputes and is monotone") {
    val rows = Lifecycle.queries("q_nelson_aalen")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val users = eventsWithMs(s"$sf/events.parquet")
      .groupBy(col("user_id"))
      .agg(min(col("ms")).as("f"), max(col("ms")).as("l")).collect()
      .map(r => (r.getLong(2) - r.getLong(1)) / 86400000L)
    assert(rows.map(_._3).sum === users.length) // deaths partition users
    // n_at_risk(t) = #users with lifetime ≥ t, and the hazard recomputes
    var h = 0L
    rows.foreach { case (t, n, d, hp) =>
      assert(n === users.count(_ >= t))
      h += d * 1000000L / n
      assert(hp === h)
    }
    // cumulative hazard is non-decreasing by construction
    assert(rows.map(_._4).sameElements(rows.map(_._4).sorted))
  }

  test("q_funnel_strict_window: counts nest and never exceed loose funnel") {
    val got = Lifecycle.queries("q_funnel_strict_window")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L) >= got(2L) && got(2L) >= got(3L))
    // brute-force recompute of the 1h-gated gating
    val byUser = eventsWithMs(s"$sf/events.parquet")
      .select(col("user_id"), col("event_type"), col("ms")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val W = 3600000L
    var (c1, c2, c3) = (0L, 0L, 0L)
    byUser.values.foreach { evs =>
      val t1 = evs.filter(_._2 == "view").map(_._3).minOption
      t1.foreach { a =>
        c1 += 1
        val t2 = evs.filter(e => e._2 == "click" && e._3 >= a &&
          e._3 <= a + W).map(_._3).minOption
        t2.foreach { b =>
          c2 += 1
          if (evs.exists(e => e._2 == "purchase" && e._3 >= b &&
              e._3 <= b + W)) c3 += 1
        }
      }
    }
    assert(got(1L) === c1 && got(2L) === c2 && got(3L) === c3)
  }

  test("q_range_frame_sum: calendar gaps shrink the value-based frame") {
    val got = SqlSurface.queries("q_range_frame_sum")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2),
        r.getDouble(3)))).toMap
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_suppkey"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
          .cast("long").as("day"),
        col("l_quantity")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byDay = raw.groupBy(x => (x._1, x._2)).view
      .mapValues(v => BigDecimal(v.map(x => BigDecimal(x._3)).sum
        .setScale(2).toString))
    byDay.foreach { case ((supp, day), dq) =>
      // the frame is VALUE-based: only days within [day−6, day] that
      // actually exist contribute — a gap shrinks the sum
      val trail = byDay.collect {
        case ((s2, d2), q) if s2 == supp && d2 >= day - 6 && d2 <= day => q
      }.sum
      val (gotDay, gotTrail) = got((supp, day))
      assert(BigDecimal(gotDay) === dq && BigDecimal(gotTrail) === trail,
        s"supplier $supp day $day")
    }
  }

  test("q_lateral_topk: per-nation top-3 recomputes; decorrelated plan") {
    val df = SqlSurface.queries("q_lateral_topk")(spark, sf)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .join(spark.read.parquet(s"$sf/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_orderkey"), col("o_totalprice"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val exp = orders.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(3).toSeq
    }.toSet
    assert(got.toSet === exp && got.length === exp.size)
    // the correlated lateral must decorrelate — no per-row re-execution
    // plan shapes (cartesian/BNLJ against the outer side)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"), "lateral did not decorrelate")
  }

  test("q_k_anonymity / q_l_diversity: cohort algebra recomputes") {
    val ka = Privacy.queries("q_k_anonymity")(spark, sf).collect()
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        col("c_acctbal")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val cohorts = cust.groupBy(c => (c._1, c._2)).view
      .mapValues(_.length.toLong).toMap
    val k = cohorts.values.min
    val riskyRows = cohorts.values.filter(_ < 5L).sum
    assert(ka.length === cohorts.size)
    ka.foreach { r =>
      val key = (r.getLong(0), r.getString(1))
      assert(r.getLong(2) === cohorts(key))
      assert(r.getLong(3) === k)
      assert(r.getBoolean(4) === (cohorts(key) < 5L))
      assert(r.getLong(5) === riskyRows * 10000L / cust.length)
    }
    val ld = Privacy.queries("q_l_diversity")(spark, sf).collect()
    ld.foreach { r =>
      val key = (r.getLong(0), r.getString(1))
      val bands = cust.filter(c => (c._1, c._2) == key).map(c =>
        if (c._3 < 0) "neg" else if (c._3 < 5000) "small" else "large")
      val byBand = bands.groupBy(identity).view.mapValues(_.length.toLong)
      assert(r.getLong(2) === byBand.size.toLong)
      assert(r.getLong(3) === bands.length.toLong)
      assert(r.getLong(4) === byBand.values.max)
      assert(r.getLong(5) === byBand.values.max * 10000L / bands.length)
    }
  }

  test("q_sssp_hops: distances match a driver-side BFS; radius respected") {
    val got = Association.queries("q_sssp_hops")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rebuild the support-≥2 co-purchase graph driver-side
    val items = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairN = scala.collection.mutable.Map[(Long, Long), Long]()
    items.groupBy(_._1).values.foreach { b =>
      val v = b.map(_._2).toSeq.sorted
      for (i <- v.indices; j <- i + 1 until v.length)
        pairN((v(i), v(j))) = pairN.getOrElse((v(i), v(j)), 0L) + 1
    }
    val edges = pairN.filter(_._2 >= 2).keys.toSeq
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet)
    val srcNode = edges.map(_._1).min
    val dist = scala.collection.mutable.Map(srcNode -> 0L)
    var frontier = Set(srcNode)
    for (d <- 1L to 4L) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .filterNot(dist.contains)
      frontier.foreach(n => dist(n) = d)
    }
    assert(got === dist.toMap)
    assert(got.values.max <= 4L)
  }

  test("q_textrank_keywords: damping floor holds and reruns are stable") {
    val q = TextRank.queries("q_textrank_keywords")
    val a = q(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(a.nonEmpty && a.length <= 50)
    // every score ≥ the damping floor 0.15 (micro-units, post-iteration)
    assert(a.forall(_._3 >= 150000L))
    // declared (score desc, term asc) order
    val order = a.map(t => (-t._3, t._1))
    assert(order.sameElements(order.sorted))
    val b = q(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(a.sameElements(b))
  }
}
