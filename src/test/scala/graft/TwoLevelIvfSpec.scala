package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorQueries

/** Two-level IVF assignment quality: the coarse-then-fine descent must
  * (a) assign every vector a real cell, (b) agree with the flat exact
  * argmin on a healthy majority of vectors even on RANDOM embeddings —
  * the hardest case for coarse pruning, since random high-dim vectors
  * are nearly equidistant — and (c) converge to the flat assignment as
  * probeGroups grows (probing every group IS the flat argmin).
  */
class TwoLevelIvfSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
  private val C = 64
  private lazy val centroids = emb.filter(col("vec_id") < C)
    .select(col("vec_id").as("cell"), col("embedding").as("centroid"))

  private def flatCells: Map[Long, Long] =
    VectorQueries.withCell(emb,
        VectorQueries.centroidArray(centroids), col("embedding"))
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def twoLevelCells(probeGroups: Int): Map[Long, Long] =
    VectorQueries.withCellTwoLevel(emb, centroids, col("embedding"),
        fanout = 8, probeGroups = probeGroups)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("every vector is assigned a real cell") {
    val cells = twoLevelCells(2)
    assert(cells.size === emb.count())
    assert(cells.values.forall(c => c >= 0 && c < C))
  }

  test("agreement with flat argmin is majority at probeGroups=2 and grows") {
    val flat = flatCells
    def agreement(pg: Int): Double = {
      val tl = twoLevelCells(pg)
      flat.count { case (id, c) => tl(id) == c }.toDouble / flat.size
    }
    val a2 = agreement(2)
    val a4 = agreement(4)
    assert(a2 >= 0.5, s"probeGroups=2 agreement $a2")
    assert(a4 >= a2, s"agreement must not shrink with wider probes: $a2 -> $a4")
    // probing every coarse group degenerates to the exact flat argmin
    assert(agreement(8) === 1.0)
  }

  test("join-based assignment is IDENTICAL to the broadcast descent " +
    "(same reps, probing, and argmin tie-breaks) and partition-invariant") {
    for (pg <- Seq(1, 2, 4)) {
      val broadcastForm = twoLevelCells(pg)
      val joined = VectorQueries.withCellJoined(emb, centroids,
          col("embedding"), Seq("vec_id"), fanout = 8, probeGroups = pg)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(joined === broadcastForm, s"probeGroups=$pg diverged")
    }
    // the shuffle plan must not make the answer partitioning-dependent
    val repart = VectorQueries.withCellJoined(emb.repartition(7),
        centroids.repartition(5), col("embedding"), Seq("vec_id"),
        fanout = 8, probeGroups = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(repart === twoLevelCells(2))
  }
}
