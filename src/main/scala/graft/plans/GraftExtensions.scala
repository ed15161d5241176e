package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Catalyst extension point for graft's native functions. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` on
  * the session builder (Verify/Bench/tests all do), after which
  * `expr("bounded_topk(score, id, k)")` resolves like a built-in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("bounded_topk"),
      new ExpressionInfo(classOf[BoundedTopK].getName, "bounded_topk"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3,
          "bounded_topk(score, id, k) takes exactly 3 arguments")
        BoundedTopK(children(0), children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "cosine_sim(a, b) takes 2 arguments")
        CosineSimilarity(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_affine"),
      new ExpressionInfo(classOf[MinHashAffine].getName, "minhash_affine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          "minhash_affine(hashes, n) takes 2 arguments")
        MinHashAffine(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "simhash60(hashes) takes 1 argument")
        SimHash60(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("l2_sq"),
      new ExpressionInfo(classOf[L2SquaredDistance].getName, "l2_sq"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "l2_sq(a, b) takes 2 arguments")
        L2SquaredDistance(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("long_dot"),
      new ExpressionInfo(classOf[LongDotProduct].getName, "long_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "long_dot(a, b) takes 2 arguments")
        LongDotProduct(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("srp_sig"),
      new ExpressionInfo(classOf[SrpSignature].getName, "srp_sig"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "srp_sig(vec, bits) takes 2 arguments")
        SrpSignature(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("rp_project"),
      new ExpressionInfo(classOf[RpProject].getName, "rp_project"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          "rp_project(vec, dims) takes 2 arguments")
        RpProject(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("freq_sketch"),
      new ExpressionInfo(classOf[FreqSketch].getName, "freq_sketch"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          "freq_sketch(key, capacity) takes 2 arguments")
        FreqSketch(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketch].getName, "kmv_sketch"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          "kmv_sketch(hash, k) takes 2 arguments")
        KmvSketch(children(0), children(1))
      }))
    // Spark's OWN runtime-filter machinery, exposed as named functions
    // (they back InjectRuntimeFilter but have no public SQL surface):
    // bloom_agg builds the sketch, bloom_contains probes it. Used by
    // operators.BloomPrune for semi-join pruning with a precomputed
    // filter (the bloom side must be a foldable literal — the analyzer
    // enforces it).
    ext.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3,
          "bloom_agg(longKey, estItems, numBits) takes 3 arguments")
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(children(0), children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_contains"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          "bloom_contains(bloomBinary, longKey) takes 2 arguments")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))
      }))
  }
}
