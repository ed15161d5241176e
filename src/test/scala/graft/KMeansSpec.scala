package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KMeans

/** Lloyd's iterations on seeded random vectors: WCSS is monotonically
  * non-increasing, assignments stay within the centroid set, and
  * refinement strictly improves over the seed centroids on clustered
  * data.
  */
class KMeansSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def clustered(n: Int, dim: Int, k: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    // k well-separated centers, points jittered around them
    val centers = Array.fill(k, dim)(rnd.nextFloat() * 10)
    Seq.tabulate(n) { i =>
      val c = centers(i % k)
      (i.toLong, c.map(v => v + rnd.nextFloat() * 0.5f))
    }.toDF("vec_id", "embedding")
  }

  test("WCSS non-increasing over iterations; improves on seed centroids") {
    val emb = clustered(300, 8, 4, seed = 5)
    val seedCent = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("cell"),
        col("embedding").as("centroid"))
    def w(c: org.apache.spark.sql.DataFrame): Double =
      KMeans.wcss(emb, c).as[Double].collect().head
    val w0 = w(seedCent)
    val c1 = KMeans.refine(emb, seedCent, 1)
    val w1 = w(c1)
    val c3 = KMeans.refine(emb, seedCent, 3)
    val w3 = w(c3)
    assert(w1 <= w0)
    assert(w3 <= w1)
    assert(w3 < w0 * 0.9) // clustered data: real improvement, not noise
  }

  test("assignments reference existing cells only") {
    val emb = clustered(100, 4, 3, seed = 6)
    val seedCent = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").cast("int").as("cell"),
        col("embedding").as("centroid"))
    val refined = KMeans.refine(emb, seedCent, 2)
    val cells = refined.select(col("cell")).as[Int].collect().toSet
    val assignedCells = KMeans.assign(emb, refined)
      .select(col("cell")).distinct().as[Int].collect().toSet
    assert(assignedCells.subsetOf(cells))
  }
}
