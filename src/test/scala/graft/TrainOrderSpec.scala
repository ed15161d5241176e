package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, TextQueries, VectorQueries}

/** Round-8 ordering/dedup additions: the epoch-shuffle permutation
  * contract, k-fold partitioning, curriculum band composition, the
  * normalization-dedup merge semantics, shared-prefix grouping, and the
  * MRR/hubness consistency laws against the brute-force truth.
  */
class TrainOrderSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def tmpDocs(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("trainorder").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_epoch_shuffle: per-shard positions are exactly 1..n(shard), " +
    "docs partition exactly once") {
    val out = Curation.queries("q_epoch_shuffle")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.length === total)                   // every doc, once
    assert(out.map(_._1).distinct.length === out.length)
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length)) // dense rank
    }
  }

  test("q_epoch_shuffle is partitioning-invariant (hash, not rand)") {
    val a = Curation.queries("q_epoch_shuffle")(spark, sf)
      .orderBy("doc_id").collect().toSeq
    val b = Curation.queries("q_epoch_shuffle")(spark, sf)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("q_crossfold: folds partition the corpus, all folds in 0..4") {
    val out = Curation.queries("q_crossfold")(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.map(_.getLong(2)).sum === total)
    assert(out.map(_.getLong(0)).forall(f => f >= 0 && f <= 4))
  }

  test("q_curriculum_order: bands partition docs; positions dense per " +
    "(band, shard)") {
    val out = TextQueries.queries("q_curriculum_order")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3)))
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.length === total)
    out.groupBy(r => (r._2, r._3)).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1 to rows.length))
    }
  }

  test("q_normalize_dedup merges case/punct/whitespace variants only") {
    val dir = tmpDocs(Seq(
      (1L, "Hello, World!", "en", "s0"),
      (2L, "hello world", "en", "s0"),
      (3L, "HELLO   WORLD", "en", "s0"),
      (4L, "hello worlds", "en", "s0")))
    val out = TextQueries.queries("q_normalize_dedup")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // one merged group of the three variants (3 raw byte-variants), one
    // singleton for the genuinely different doc 4
    assert(out.toSet === Set((1L, 3L, 3L), (4L, 1L, 1L)))
  }

  test("q_prefix_dup groups docs sharing the first 8 tokens; short and " +
    "unique docs never appear") {
    val shared = "a b c d e f g h"
    val dir = tmpDocs(Seq(
      (1L, s"$shared tail one", "en", "s0"),
      (2L, s"$shared completely different continuation", "en", "s0"),
      (3L, "a b c d e f g DIFFERENT tail", "en", "s0"),
      (4L, "too short", "en", "s0")))
    val out = TextQueries.queries("q_prefix_dup")(spark, dir).collect()
    assert(out.length === 1)
    assert(out(0).getLong(1) === 2L)   // n_docs
    assert(out(0).getLong(2) === 1L)   // exemplar = min doc_id
  }

  test("q_token_fertility: subwords never undercount words (bp >= 10000)") {
    val out = TextQueries.queries("q_token_fertility")(spark, sf).collect()
    assert(out.nonEmpty)
    // every whitespace word contributes >= 1 subword under the BPE-ish
    // regex, so fertility in basis points is bounded below by 10000
    assert(out.forall(r => r.getLong(4) >= 10000L))
  }

  test("q_ann_mrr: rank-1 hits give rr_bp 10000; misses give 0; one row " +
    "per query") {
    val out = VectorQueries.queries("q_ann_mrr")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.length === 10) // N_QUERIES
    out.foreach { case (_, rank, rr) =>
      if (rank == 0L) assert(rr === 0L)
      else assert(rr === 10000L / rank)
    }
  }

  test("q_hubness: list memberships sum to Q*k over the truth table") {
    val out = VectorQueries.queries("q_hubness")(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum === 10L * 5L) // N_QUERIES * TOP_K
    assert(out.forall(r => r.getLong(2) >= 1L && r.getLong(2) <= 5L))
  }

  test("q_top_eigvec recovers the direction of rank-1 data") {
    // x_i = s_i · (0.4, 0.2, 0.1, 0.05): the dominant eigenvector IS the
    // generating direction; after max-abs renormalization the iterate
    // must be ~(2^20, 2^19, 2^18, 2^17) up to quantization rounding
    val dir0 = Seq(0.4f, 0.2f, 0.1f, 0.05f)
    val scalars = Seq(1.0f, -2.0f, 3.0f, 0.5f, -1.5f, 2.5f)
    val dir = java.nio.file.Files.createTempDirectory("eig").toString
    scalars.zipWithIndex
      .map { case (sc, i) => (i.toLong, dir0.map(_ * sc).toArray, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = VectorQueries.queries("q_top_eigvec")(spark, dir)
      .orderBy("pos").collect().map(_.getLong(1))
    assert(out.length === 4)
    assert(math.abs(out(0)) === 1048576L) // max-abs normalized
    // all components carry the SAME sign and halve down the direction
    val s0 = math.signum(out(0).toDouble)
    (0 until 4).foreach { i =>
      val expected = s0 * (1048576L >> i)
      assert(math.abs(out(i) - expected) <= 4000L,
        s"pos $i: ${out(i)} vs $expected")
    }

    // rank-1 data puts ALL variance in one direction: the anisotropy
    // ratio must sit at its ceiling d*10^4 (up to quantization)
    val ratio = VectorQueries.queries("q_anisotropy_ratio")(spark, dir)
      .collect()(0)
    assert(ratio.getLong(1) === 4L) // dims
    assert(ratio.getLong(2) >= 39000L && ratio.getLong(2) <= 40000L,
      s"anisotropy_bp ${ratio.getLong(2)}")
  }
}
