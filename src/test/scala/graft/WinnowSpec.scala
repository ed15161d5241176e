package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Winnow}

/** Winnowing fingerprints and DSIR importance weights, checked by
  * independent driver-side recomputation (plain Scala, no Spark
  * expressions) against the sf0.001 corpus, plus the paper's coverage
  * guarantee and an engine-path partial-overlap detection case.
  */
class WinnowSpec extends AnyFunSuite with SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val K = 3
  private val W = 4

  // driver-side twin of Dedup.hash32: first 8 md5 hex digits of
  // "seed:value" as an unsigned 32-bit integer
  private def hash32(seed: Int, s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$s".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16)
  }

  private def tokensOf(text: String): Seq[String] = {
    val t = text.toLowerCase(java.util.Locale.ROOT).trim
    if (t.isEmpty) Seq.empty else t.split("\\s+").toSeq
  }

  /** Plain-Scala winnowing: encoded (hash·2²⁰ + pos) selections. */
  private def winnow(toks: Seq[String]): Seq[Long] = {
    val hs = toks.sliding(K).map(g => hash32(0, g.mkString(" "))).toVector
    (0 to hs.length - W).map { j =>
      val win = hs.slice(j, j + W)
      val mn = win.min
      val pos = j + win.lastIndexOf(mn) // rightmost tie-break
      mn * 1048576L + pos
    }.distinct
  }

  private lazy val corpus: Seq[(Long, String, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("q_winnow_fingerprints ≡ driver-side recomputation") {
    val expected = corpus.flatMap { case (id, _, text) =>
      val toks = tokensOf(text)
      if (toks.length < K + W - 1) None
      else {
        val m = (toks.length - K + 1).toLong
        val sel = winnow(toks)
        Some((id, m, sel.size.toLong,
          sel.size.toLong * 10000 / (m - (W - 1))))
      }
    }.toSet
    val got = Winnow.queries("q_winnow_fingerprints")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getInt(2).toLong,
        r.getLong(3))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("coverage guarantee: every window of W grams holds a selection") {
    corpus.foreach { case (_, _, text) =>
      val toks = tokensOf(text)
      if (toks.length >= K + W - 1) {
        val sel = winnow(toks).map(s => (s % 1048576L).toInt).toSet
        val m = toks.length - K + 1
        (0 to m - W).foreach { j =>
          assert((j until j + W).exists(sel.contains),
            s"window $j has no selected position")
        }
      }
    }
  }

  test("density tracks the 2/(W+1) theory corpus-wide") {
    val (selTot, winTot) = corpus.foldLeft((0L, 0L)) {
      case ((s, w), (_, _, text)) =>
        val toks = tokensOf(text)
        if (toks.length < K + W - 1) (s, w)
        else {
          val m = toks.length - K + 1
          (s + winnow(toks).size, w + (m - W + 1))
        }
    }
    val densityBp = selTot * 10000 / winTot
    // 2/(W+1) = 4000 bp; winnowing guarantees ≥ 1/window and the
    // expectation holds to within a loose corpus-level band
    assert(densityBp >= 3000 && densityBp <= 6000, s"density $densityBp bp")
  }

  test("partial overlap detection: shifted copy with disjoint tail") {
    // doc 2 = 20-token run of doc 1 at a shifted position + its own
    // tail: whole-doc Jaccard is low, but winnowing selects identical
    // window-min hashes inside the shared run regardless of absolute
    // position (the guarantee: any shared run ≥ K+W-1 = 6 tokens
    // yields ≥1 shared fingerprint; 20 tokens ⇒ ~6 expected), so
    // q_winnow_matches sees the pair
    val shared = (1 to 20).map(i => s"common$i").mkString(" ")
    val d1 = s"$shared " + (1 to 30).map(i => s"alpha$i").mkString(" ")
    val d2 = (1 to 5).map(i => s"pad$i").mkString(" ") + s" $shared " +
      (1 to 30).map(i => s"omega$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    import spark.implicits._
    Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Winnow.queries("q_winnow_matches")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("q_importance_weights ≡ driver-side recomputation") {
    val B = 256
    val toks = corpus.map { case (id, src, text) =>
      (id, src, tokensOf(text))
    }.filter(_._3.nonEmpty)
    val buckets = toks.flatMap { case (id, src, ts) =>
      ts.map(t => (id, src, hash32(1, t) % B))
    }
    val raw = buckets.groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val tgt = buckets.filter(_._2 == "src0")
      .groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val rt = raw.values.sum
    val tt = tgt.values.sum
    val tPpm = raw.keys.map(b =>
      b -> (tgt.getOrElse(b, 0L) + 1) * 1000000 / (tt + B)).toMap
    val rPpm = raw.map { case (b, c) => b -> (c + 1) * 1000000 / (rt + B) }
    val expected = buckets.groupBy(_._1).map { case (id, xs) =>
      val wT = xs.map(x => tPpm(x._3)).sum
      val wR = xs.map(x => rPpm(x._3)).sum
      (id, xs.size.toLong, wT, wR, wT * 10000 / wR)
    }.toSet
    val got = Curation.queries("q_importance_weights")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
