package graft.tools

import org.apache.spark.sql.functions.col

import graft.operators.{KMeans, VectorQueries}

/** Measures IVF recall@k AND scanned-candidate volume for the first-N
  * seed index vs KMeans-fitted indexes at several iteration counts —
  * the tuning evidence behind q_ann_ivf_kmeans and AnnSpec's pins.
  * (An unbalanced index can "win" recall at equal nprobe by silently
  * scanning more of the corpus; candidates/query is the work axis.)
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.newSession("local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val brute = VectorQueries.bruteTopkFrom(emb)
      def arm(name: String, cent: org.apache.spark.sql.DataFrame): Unit = {
        val topk = VectorQueries.ivfTopkFrom(emb, cent)
        val r = VectorQueries.recallOf(brute, topk).collect()
          .map(_.getAs[Long]("recall_pct"))
        val scanned = VectorQueries.ivfCandidates(emb, cent).count()
        println(f"RECALLPROBE $sf $name recall=${r.sum.toDouble / r.length}%.1f scanned=$scanned")
      }
      arm("seeds", VectorQueries.seedCentroids(emb))
      for (it <- Seq(1, 2, 4))
        arm(s"fit$it",
          KMeans.refineQuantized(emb, VectorQueries.seedCentroids(emb), it))
      // SRP-LSH arm: recall AND the MEASURED candidate volume (the
      // analytic ~23 % could hide a skewed-bucket index scanning more)
      val srp = VectorQueries.srpTopk(spark, sf)
      val sr = VectorQueries.recallOf(brute, srp).collect()
        .map(_.getAs[Long]("recall_pct"))
      val srpScanned = VectorQueries.srpCandidates(
        emb.select(col("vec_id"),
          org.apache.spark.sql.functions.expr(
            s"srp_sig(embedding, ${VectorQueries.SRP_BITS})")
            .as("sig"))).count()
      println(f"RECALLPROBE $sf srp recall=${sr.sum.toDouble / sr.length}%.1f scanned=$srpScanned")
      graft.Graft.releaseCaches() // srpTopk persists its sig table per SF
      // PQ-ADC arm: full coded-corpus scan (candidates = n − 1 by
      // design — PQ trades recall for BYTES scanned, not rows; the
      // interesting number is how much ranking quality 8 codes retain)
      val pq = VectorQueries.queries("q_ann_pq_topk")(spark, sf)
      val pr = VectorQueries.recallOf(brute, pq).collect()
        .map(_.getAs[Long]("recall_pct"))
      println(f"RECALLPROBE $sf pq recall=${pr.sum.toDouble / pr.length}%.1f scanned=all-coded")
      // IVF-PQ arm: candidate volume = the IVF probe fraction, bytes =
      // the PQ codes — recall compounds the two approximations
      val ivfpq = VectorQueries.queries("q_ann_ivfpq_topk")(spark, sf)
      val ipr = VectorQueries.recallOf(brute, ivfpq).collect()
        .map(_.getAs[Long]("recall_pct"))
      println(f"RECALLPROBE $sf ivfpq recall=${ipr.sum.toDouble / ipr.length}%.1f scanned=ivf-fraction-coded")
      // fitted-codebook PQ arm: does one per-subspace Lloyd iteration
      // beat the first-K-slices codebook at equal code budget?
      val pqf = VectorQueries.queries("q_ann_pq_kmeans")(spark, sf)
      val fpr = VectorQueries.recallOf(brute, pqf).collect()
        .map(_.getAs[Long]("recall_pct"))
      println(f"RECALLPROBE $sf pq-kmeans recall=${fpr.sum.toDouble / fpr.length}%.1f scanned=all-coded")
    }
    spark.stop()
  }
}
