package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** `rp_project(vec, dims)` — sign-random-projection dimensionality
  * reduction over an `array<float>` embedding, as ONE fused loop.
  *
  * Component j of the result is the UN-thresholded dot product behind
  * [[SrpSignature]]'s bit j:
  *
  *   q_d    = floor(x_d · 2²⁰)                 (exact integer quantize)
  *   P_jd   = ±1 from the same LCG over the flat index:
  *            ((1103515245·(j·dim + d) + 12345) >>> 16) & 1 → +1 else −1
  *   out_j  = Σ_d q_d · P_jd                   (a LONG, not a sign bit)
  *
  * This is the Johnson–Lindenstrauss-style sketch a pipeline projects
  * high-dim embeddings through before cheap downstream work (coarse
  * clustering, bucketing, visual maps): distances are preserved in
  * expectation at dims ≪ dim, and because everything after the
  * quantize is integer arithmetic the projection is bit-identical in
  * any engine — it sits behind the DuckDB hash gate, which replays the
  * same LCG in SQL. Sharing the LCG with `srp_sig` means
  * `srp_sig(v, b) == sign bits of rp_project(v, b)` by construction
  * (a spec pins it), so the sketch and the LSH signature are one
  * consistent family.
  *
  * `dims` must be a positive int literal ≤ 63 (one long per output
  * component, same family bound as srp_sig).
  *
  * Input contract (same as srp_sig): finite, non-empty vectors. Empty
  * arrays and NaN/±Inf coordinates yield NULL — non-finite
  * floor-to-long is JVM-defined but errors on the oracle's CAST, and a
  * zero-length input would project to all-zeros indistinguishable from
  * a real orthogonal vector.
  */
case class RpProject(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "rp_project"

  private lazy val dims: Int = right match {
    case Literal(v: Int, IntegerType) if v > 0 && v <= 63 => v
    case other => throw new IllegalArgumentException(
      s"rp_project dims must be a positive int literal <= 63, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) => right match {
        case Literal(v: Int, IntegerType) if v > 0 && v <= 63 =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          "rp_project dims must be a positive int LITERAL <= 63")
      }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"rp_project requires (array<float>, int literal), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(vec: Any, b: Any): Any = {
    val a = vec.asInstanceOf[ArrayData]
    val dim = a.numElements()
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
    val out = new Array[Long](dims)
    var j = 0
    while (j < dims) {
      var dot = 0L
      d = 0
      while (d < dim) {
        val x = 1103515245L * (j.toLong * dim + d) + 12345L
        dot += (if (((x >>> 16) & 1L) == 1L) q(d) else -q(d))
        d += 1
      }
      out(j) = dot
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val dim = ctx.freshName("dim")
      val out = ctx.freshName("out")
      val dot = ctx.freshName("dot")
      val q = ctx.freshName("q")
      val f = ctx.freshName("f")
      val x = ctx.freshName("x")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      // mirrors nullSafeEval: quantize ONCE per element, null out
      // empty / non-finite inputs
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
         |  final long[] $out = new long[$dims];
         |  for (int $j = 0; $j < $dims; $j++) {
         |    long $dot = 0L;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      final long $x = 1103515245L * ((long) $j * $dim + $d) + 12345L;
         |      $dot += ((($x >>> 16) & 1L) == 1L) ? $q[$d] : -$q[$d];
         |    }
         |    $out[$j] = $dot;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RpProject =
    copy(left = newLeft, right = newRight)
}
