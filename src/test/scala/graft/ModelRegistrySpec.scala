package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, ModelRegistry, TextQueries, VersionedTable}

/** Invariants of the model registry (q_model_registry).
  *
  * The hash gate pins publish → load → serve against the twin trainer
  * chains; this spec pins the registry mechanics the gate exercises
  * only implicitly — exact roundtrip identity, version isolation
  * (rollback reads the OLD model unchanged after a new publish), and
  * the loud refusal on malformed rows.
  */
class ModelRegistrySpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def scratch(name: String): String = {
    val p = s"${graft.StageDirs.stable("model_registry_spec")}/$name"
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) fs.delete(hp, true)
    p
  }

  test("publish → load roundtrips the model EXACTLY; rollback reads " +
    "the old version unchanged") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val m1 = TextQueries.fitQualityModelSliced(docs,
      Curation.hashBucket(col("doc_id")) < 50)
    val m2 = TextQueries.fitQualityModel(docs)
    assert(m1 != m2, "fixture degenerate: both fits identical")
    val t = VersionedTable(spark, scratch("roundtrip"), retain = 3)
    ModelRegistry.publishLogit(spark, t, m1)
    ModelRegistry.publishLogit(spark, t, m2)
    assert(ModelRegistry.loadLogitAt(t, 1) == m1,
      "v1 did not roundtrip exactly")
    assert(ModelRegistry.loadLogitAt(t, 2) == m2,
      "v2 did not roundtrip exactly")
  }

  test("novelty cover: publish → load → serve ≡ the direct fit") {
    import graft.operators.{ModelRegistry => MR, VectorQueries, VersionedTable}
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val t = VersionedTable(spark, scratch("novelty"), retain = 3)
    MR.publishNovelty(t, VectorQueries.noveltyModelRows(emb))
    val direct = VectorQueries.noveltyScore(emb, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val served = VectorQueries
      .noveltyScoreFromRows(emb, MR.loadRowsAt(t, 1)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(served == direct, "published cover served a different assignment")
    assert(direct.nonEmpty)
  }

  test("malformed registry rows are refused loudly") {
    import spark.implicits._
    val t = VersionedTable(spark, scratch("malformed"), retain = 3)
    t.overwrite(Seq(("mean", 0L, 1L), ("sd", 0L, 1L))
      .toDF("param", "idx", "value"))
    val e = intercept[IllegalArgumentException] {
      ModelRegistry.loadLogitAt(t, 1)
    }
    assert(e.getMessage.contains("not a logit model"))
  }
}
