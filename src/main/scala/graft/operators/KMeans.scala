package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.l2Sq

/** Lloyd's k-means over `array<float>` embeddings, as pure DataFrame
  * aggregation — the training step that turns the IVF index's
  * deterministic seed centroids into fitted ones.
  *
  * Per iteration: assignment is the same narrow argmin aggregate the IVF
  * query uses (embeddings never enter that shuffle), and the centroid
  * update is an element-wise mean via posexplode → (cell, pos) avg →
  * array rebuild (per-cell arrays are dimension-bounded, so collect_list
  * here is safe). Each iteration ends in `localCheckpoint` — iterative
  * plans double in depth per round otherwise, which is the classic
  * driver-side planning blowup at scale.
  */
object KMeans {

  /** (vec_id, cell, d2): nearest centroid per vector. */
  def assign(emb: DataFrame, centroids: DataFrame): DataFrame =
    emb.crossJoin(broadcast(centroids))
      .select(col("vec_id"),
        struct(l2Sq(col("embedding"), col("centroid")).as("d2"),
          col("cell").as("cell")).as("dc"))
      .groupBy(col("vec_id"))
      .agg(min(col("dc")).as("m"))
      .select(col("vec_id"), col("m.cell").as("cell"), col("m.d2").as("d2"))

  /** Refine centroids for `iters` Lloyd iterations. Empty cells drop out
    * (standard Lloyd behavior — k can only shrink).
    */
  def refine(emb: DataFrame, initial: DataFrame, iters: Int): DataFrame = {
    var cent = initial
    var i = 0
    while (i < iters) {
      val assigned = assign(emb, cent)
      cent = emb.join(assigned, "vec_id")
        .select(col("cell"), posexplode(col("embedding")))
        .toDF("cell", "pos", "v")
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("cell"))
        .agg(sort_array(collect_list(struct(col("pos"), col("m"))))
          .as("pm"))
        .select(col("cell"),
          transform(col("pm"), x => x.getField("m").cast("float"))
            .as("centroid"))
        .localCheckpoint()
      i += 1
    }
    cent
  }

  /** Within-cluster sum of squares — the convergence metric. */
  def wcss(emb: DataFrame, centroids: DataFrame): DataFrame =
    assign(emb, centroids).agg(sum(col("d2")).as("wcss"))
}
