package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Chunking

/** Content-defined chunking: driver-side recomputation of the chunk
  * decomposition against the sf0.001 corpus, the content-locality
  * property (an early insertion leaves chunks after the next boundary
  * identical), and boundary edge cases.
  */
class ChunkingSpec extends AnyFunSuite with SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val DIV = 8

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

  /** Plain-Scala decomposition: chunks as (nTok, contentHash), the
    * boundary-token-ends-its-chunk rule.
    */
  private def chunksOf(toks: Seq[String]): Seq[(Int, Long)] = {
    val bpos = (1 until toks.length)
      .filter(i => hash32(2, s"${toks(i - 1)} ${toks(i)}") % DIV == 0)
    val ends = if (bpos.lastOption.contains(toks.length - 1)) bpos
      else bpos :+ (toks.length - 1)
    ends.foldLeft((Seq.empty[(Int, Long)], 0)) {
      case ((acc, start), end) =>
        val c = toks.slice(start, end + 1)
        (acc :+ ((c.length, hash32(3, c.mkString(" ")))), end + 1)
    }._1
  }

  private lazy val corpus: Seq[(Long, Seq[String])] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), tokensOf(r.getString(1))))
      .filter(_._2.nonEmpty).toSeq

  test("q_cdc_chunks ≡ driver-side recomputation") {
    val expected = corpus.map { case (id, toks) =>
      val cs = chunksOf(toks)
      (id, toks.length.toLong, cs.length.toLong,
        toks.length.toLong / cs.length,
        cs.map(_._1).max.toLong)
    }.toSet
    val got = Chunking.queries("q_cdc_chunks")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getInt(2).toLong,
        r.getLong(3), r.getInt(4).toLong)).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q_cdc_shared ≡ driver-side recomputation") {
    val all = corpus.flatMap { case (_, toks) => chunksOf(toks) }
    val byHash = all.groupBy(_._2)
    val total = all.map(_._1.toLong).sum
    val saved = byHash.values.map(g => (g.size - 1).toLong * g.head._1).sum
    val row = Chunking.queries("q_cdc_shared")(spark, sf).collect().head
    assert(row.getLong(0) === all.size.toLong)       // n_chunks
    assert(row.getLong(1) === byHash.size.toLong)    // n_distinct
    assert(row.getLong(2) === total)                 // tokens_total
    assert(row.getLong(3) === saved)                 // tokens_saved
    assert(row.getLong(4) === saved * 10000 / total) // dedup_bp
    assert(saved > 0, "corpus near-dups should share chunks")
  }

  test("content locality: early insertion preserves later chunks") {
    // the CDC property fixed-size blocks lack: prepending tokens only
    // perturbs chunks up to the first boundary after the edit
    val base = corpus.maxBy(_._2.length)._2
    val edited = Seq("zzz1", "zzz2") ++ base
    val a = chunksOf(base).map(_._2)
    val b = chunksOf(edited).map(_._2)
    val sharedSuffix = a.reverse.zip(b.reverse).takeWhile {
      case (x, y) => x == y
    }.length
    assert(sharedSuffix >= a.length - 3,
      s"only $sharedSuffix of ${a.length} trailing chunks survived a " +
        "2-token prepend — boundaries are not content-local")
  }

  test("edge cases: single token, trailing boundary, no boundaries") {
    assert(chunksOf(Seq("alpha")).length === 1)
    // a run with no qualifying 2-gram stays one chunk
    val none = (1 to 20).map(_ => "alpha")
    if (hash32(2, "alpha alpha") % DIV != 0)
      assert(chunksOf(none).length === 1)
    // driver rule and engine rule agree that a trailing boundary adds
    // no empty chunk: total token mass is conserved in every doc
    corpus.foreach { case (_, toks) =>
      assert(chunksOf(toks).map(_._1).sum === toks.length)
    }
  }
}
