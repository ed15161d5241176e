package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `minhash_affine(hm, n)` — all n MinHash signature slots in ONE fused
  * loop over the in-row base-hash array.
  *
  * The Column-API formulation ([[graft.operators.Dedup.minhashSignatures]]'s
  * reference form) is n separate `array_min(transform(...))` higher-order
  * passes per row — CodegenFallback, interpreted dispatch per element,
  * n times. This expression makes one pass: for each base hash h the
  * inner loop updates every slot's running min of `(aᵢ·h + bᵢ) mod p`,
  * with the SAME affine constants as [[graft.operators.Dedup.affineA]]/
  * [[graft.operators.Dedup.affineB]] (p = 2³¹−1; aᵢ, h < 2³¹ keeps the
  * product under 2⁶² — no overflow), so signatures are bit-identical to
  * the reference form and to the DuckDB oracle.
  *
  * Null array → null; null elements skipped (the hash projection never
  * produces them). Empty array → null (no shingles ⇒ no signature).
  * n must be a positive integer literal (the constants are precomputed
  * at plan time and shipped as references).
  */
case class MinHashAffine(left: Expression, right: Expression)
  extends BinaryExpression {

  private val P = 2147483647L

  private lazy val n: Int = right match {
    case Literal(v: Int, IntegerType) if v > 0 => v
    case other => throw new IllegalArgumentException(
      s"minhash_affine n must be a positive int literal, got $other")
  }

  private lazy val aArr: Array[Long] = Array.tabulate(n) { i =>
    val a = ((2L * i + 1L) * 2654435761L) % P
    if (a == 0L) 1L else a
  }
  private lazy val bArr: Array[Long] =
    Array.tabulate(n)(i => (40503L * i + 12345L) % P)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_affine"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"minhash_affine requires (array<bigint>, int), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def eval(input: InternalRow): Any = {
    val hv = left.eval(input)
    if (hv == null) return null
    val hs = hv.asInstanceOf[ArrayData]
    val m = hs.numElements()
    if (m == 0) return null
    val mins = Array.fill(n)(Long.MaxValue)
    var j = 0
    while (j < m) {
      if (!hs.isNullAt(j)) {
        val h = hs.getLong(j)
        var i = 0
        while (i < n) {
          val v = (aArr(i) * h + bArr(i)) % P
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    val leftGen = left.genCode(ctx)
    val m = ctx.freshName("m")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val h = ctx.freshName("h")
    val v = ctx.freshName("v")
    val mins = ctx.freshName("mins")
    ev.copy(code =
      code"""
         |${leftGen.code}
         |boolean ${ev.isNull} = true;
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (!${leftGen.isNull}) {
         |  final int $m = ${leftGen.value}.numElements();
         |  if ($m > 0) {
         |    final long[] $mins = new long[$n];
         |    java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |    for (int $j = 0; $j < $m; $j++) {
         |      if (!${leftGen.value}.isNullAt($j)) {
         |        final long $h = ${leftGen.value}.getLong($j);
         |        for (int $i = 0; $i < $n; $i++) {
         |          final long $v = ($aRef[$i] * $h + $bRef[$i]) % ${P}L;
         |          if ($v < $mins[$i]) $mins[$i] = $v;
         |        }
         |      }
         |    }
         |    ${ev.isNull} = false;
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |  }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashAffine =
    copy(left = newLeft, right = newRight)
}
