package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** Native cosine_sim / l2_sq expressions: bit-identical to the
  * higher-order-function reference formulation (same left-to-right
  * double fold), plus null/mismatch semantics.
  */
class VectorExprSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def randVecs(n: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((Array.fill(dim)(rnd.nextFloat() * 2 - 1),
      Array.fill(dim)(rnd.nextFloat() * 2 - 1))).toDF("a", "b")
  }

  test("native == HOF, bit-identical on random vectors") {
    val df = randVecs(500, 64, seed = 3)
    val mismatches = df.select(
        VectorFunctions.cosine(col("a"), col("b")).as("c_native"),
        VectorFunctions.cosineHof(col("a"), col("b")).as("c_hof"),
        VectorFunctions.l2Sq(col("a"), col("b")).as("l_native"),
        VectorFunctions.l2SqHof(col("a"), col("b")).as("l_hof"))
      .filter(col("c_native") =!= col("c_hof") ||
        col("l_native") =!= col("l_hof"))
      .count()
    assert(mismatches === 0)
  }

  test("known values") {
    val df = Seq((Array(1f, 0f), Array(1f, 0f)),
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(3f, 4f), Array(0f, 0f))).toDF("a", "b")
    val cos = df.select(VectorFunctions.cosine(col("a"), col("b")))
      .as[Double].collect()
    assert(cos(0) === 1.0)
    assert(cos(1) === 0.0)
    assert(cos(2).isNaN) // zero norm → 0/0
    val l2 = df.select(VectorFunctions.l2Sq(col("a"), col("b")))
      .as[Double].collect()
    assert(l2(0) === 0.0 && l2(1) === 2.0 && l2(2) === 25.0)
  }

  test("length mismatch and null input → null") {
    val df = Seq((Array(1f, 2f), Array(1f, 2f, 3f)))
      .toDF("a", "b")
    val out = df.select(
        VectorFunctions.cosine(col("a"), col("b")).as("c"),
        VectorFunctions.l2Sq(col("a"), col("b")).as("l"),
        VectorFunctions.cosine(lit(null).cast("array<float>"), col("a"))
          .as("cn"))
      .collect().head
    assert(out.isNullAt(0) && out.isNullAt(1) && out.isNullAt(2))
  }

  test("long_dot: native == HOF on random long arrays; null semantics") {
    val rnd = new scala.util.Random(17)
    val df = Seq.fill(300)((Array.fill(64)(rnd.nextInt(1 << 21).toLong),
        Array.fill(64)(rnd.nextInt(1 << 21).toLong)))
      .toDF("a", "b")
    val mismatches = df.select(
        VectorFunctions.longDot(col("a"), col("b")).as("n"),
        VectorFunctions.longDotHof(col("a"), col("b")).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(mismatches === 0)
    val edge = Seq((Array(2L, 3L), Array(4L, 5L)))
      .toDF("a", "b")
      .select(
        VectorFunctions.longDot(col("a"), col("b")).as("v"),
        VectorFunctions.longDot(col("a"),
          lit(Array(1L, 2L, 3L))).as("mismatch"),
        VectorFunctions.longDot(lit(null).cast("array<bigint>"),
          col("b")).as("nul"),
        VectorFunctions.longDot(lit(Array.empty[Long]),
          lit(Array.empty[Long])).as("empty"))
      .collect().head
    assert(edge.getLong(0) === 23L)
    assert(edge.isNullAt(1) && edge.isNullAt(2))
    assert(edge.getLong(3) === 0L)
  }

  test("rp_project: srp_sig IS the sign bits of rp_project") {
    // the two expressions share the quantize grid and LCG by
    // construction; this pins that they can never drift apart
    val df = randVecs(200, 64, seed = 17)
    val bad = df.select(expr("srp_sig(a, 16)").as("sig"),
        expr("rp_project(a, 16)").as("rp"))
      .withColumn("recon", expr(
        "aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, j) -> " +
          "acc + CASE WHEN element_at(rp, j + 1) > 0 " +
          "THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END)"))
      .filter(col("sig") =!= col("recon"))
      .count()
    assert(bad === 0)
  }

  test("rp_project: degenerate inputs → null; sane values") {
    val df = Seq((Array.empty[Float], Array(Float.NaN, 1f),
      Array(1f, 0f))).toDF("e", "n", "v")
    val out = df.select(expr("rp_project(e, 8)").as("re"),
      expr("rp_project(n, 8)").as("rn"),
      expr("rp_project(v, 8)").as("rv")).collect().head
    assert(out.isNullAt(0) && out.isNullAt(1))
    // q = (floor(1·2²⁰), floor(0·2²⁰)) = (2²⁰, 0) ⇒ every component
    // is ±2²⁰ depending on the LCG sign of flat index j·2+0
    val rv = out.getSeq[Long](2)
    assert(rv.length === 8 && rv.forall(v => math.abs(v) === 1048576L))
  }
}
