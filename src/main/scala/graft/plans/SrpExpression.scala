package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** `srp_sig(vec, bits)` — signed-random-projection (random hyperplane)
  * LSH signature over an `array<float>` embedding, as ONE fused loop.
  *
  * Bit j of the result is the SIGN of the dot product between the
  * vector and pseudo-hyperplane j:
  *
  *   q_d   = floor(x_d · 2²⁰)                  (exact integer quantize)
  *   P_jd  = ±1 from an LCG over the flat index:
  *           ((1103515245·(j·dim + d) + 12345) >>> 16) & 1 → +1 else −1
  *   bit_j = (Σ_d q_d · P_jd) > 0
  *
  * Everything after the quantize is INTEGER arithmetic — the sum is
  * order-free and bit-identical in any engine, so the signature sits
  * behind the DuckDB hash gate (the oracle replays the same LCG in
  * SQL). Cosine is sign-invariant under the quantize only up to the
  * 2⁻²⁰ grid, but both engines compute the SAME grid, which is what
  * determinism needs. The in-loop LCG costs 3 integer ops per
  * (bit, dim) — cheaper than materializing and broadcasting a plane
  * matrix, and it keeps the expression self-contained for codegen.
  *
  * `bits` must be a positive int literal ≤ 63 (the signature rides a
  * signed long).
  *
  * Input contract: finite, non-empty vectors. Empty arrays and vectors
  * containing NaN/±Inf yield NULL (not a fake signature) — an empty
  * array would otherwise sign to 0 and collide with every band-0
  * bucket, and non-finite floor-to-long diverges between the JVM and
  * the SQL oracle's CAST. Null signatures drop out of every downstream
  * band join, matching the oracle's unnest dropping the row.
  */
case class SrpSignature(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "srp_sig"

  private lazy val bits: Int = right match {
    case Literal(v: Int, IntegerType) if v > 0 && v <= 63 => v
    case other => throw new IllegalArgumentException(
      s"srp_sig bits must be a positive int literal <= 63, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) => right match {
        // literal-ness checked at ANALYSIS time: a non-literal bits
        // column would otherwise pass analysis and die at eval with a
        // raw IllegalArgumentException mid-job
        case Literal(v: Int, IntegerType) if v > 0 && v <= 63 =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          "srp_sig bits must be a positive int LITERAL <= 63 " +
            "(the signature rides a signed long)")
      }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"srp_sig requires (array<float>, int literal), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(vec: Any, b: Any): Any = {
    val a = vec.asInstanceOf[ArrayData]
    val dim = a.numElements()
    // degenerate inputs → null rather than a fake signature: an empty
    // array would yield sig=0 (joining every band-0 bucket) while the
    // oracle's unnest DROPS the row, and NaN/Inf floor-to-long is
    // JVM-defined (0 / Long.MaxValue) but ERRORS on DuckDB's
    // CAST(... AS BIGINT) — null keeps both engines row-identical
    // (null band keys never match a join)
    if (dim == 0) return null
    val q = new Array[Long](dim)
    var d = 0
    while (d < dim) {
      val f = a.getFloat(d)
      if (java.lang.Float.isNaN(f) || java.lang.Float.isInfinite(f))
        return null
      q(d) = math.floor(f.toDouble * 1048576.0).toLong
      d += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      var dot = 0L
      d = 0
      while (d < dim) {
        val x = 1103515245L * (j.toLong * dim + d) + 12345L
        dot += (if (((x >>> 16) & 1L) == 1L) q(d) else -q(d))
        d += 1
      }
      if (dot > 0L) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val dim = ctx.freshName("dim")
      val sig = ctx.freshName("sig")
      val dot = ctx.freshName("dot")
      val q = ctx.freshName("q")
      val f = ctx.freshName("f")
      val x = ctx.freshName("x")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      // mirrors nullSafeEval: quantize ONCE per element (not per
      // bit×element), and null out empty / non-finite inputs
      s"""
         |final int $dim = $a.numElements();
         |boolean $bad = ($dim == 0);
         |final long[] $q = new long[$dim];
         |for (int $d = 0; !$bad && $d < $dim; $d++) {
         |  final float $f = $a.getFloat($d);
         |  if (Float.isNaN($f) || Float.isInfinite($f)) { $bad = true; }
         |  else { $q[$d] = (long) Math.floor((double) $f * 1048576.0); }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sig = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    long $dot = 0L;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      final long $x = 1103515245L * ((long) $j * $dim + $d) + 12345L;
         |      $dot += ((($x >>> 16) & 1L) == 1L) ? $q[$d] : -$q[$d];
         |    }
         |    if ($dot > 0L) $sig |= (1L << $j);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SrpSignature =
    copy(left = newLeft, right = newRight)
}
