package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `simhash60(hashes)` — the 60-bit SimHash vote/assemble step as ONE
  * fused loop over the in-row token-hash array.
  *
  * The Column-API formulation ([[graft.operators.Dedup.simhash60]]'s
  * reference `*Hof` form) is 60 separate `aggregate` higher-order folds
  * — 60 interpreted passes over the array per row, since Spark HOFs are
  * CodegenFallback. This expression makes one pass with a 60-slot vote
  * array and generates a tight Java loop via `doGenCode` (the same
  * native-vs-HOF move as [[CosineSimilarity]]).
  *
  * Semantics (bit i of the result, i ∈ [0, 60)):
  *   vote_i = Σ over hashes h of (bit_i(h) = 1 ? +1 : −1);
  *   bit_i(fp) = 1 ⟺ vote_i > 0.
  * Identical to the per-bit fold and to the DuckDB oracle's 60 CASE
  * sums. Null array → null; null ELEMENTS are not expected (the hash
  * projection never produces them) and are skipped.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  private val BITS = 60

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Int](BITS)
    var j = 0
    while (j < n) {
      if (!hs.isNullAt(j)) {
        val h = hs.getLong(j)
        var i = 0
        while (i < BITS) {
          votes(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < BITS) {
      if (votes(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val fp = ctx.freshName("fp")
      s"""
         |final int $n = $a.numElements();
         |final int[] $votes = new int[$BITS];
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$a.isNullAt($j)) {
         |    final long $h = $a.getLong($j);
         |    for (int $i = 0; $i < $BITS; $i++) {
         |      $votes[$i] += ((($h >>> $i) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $fp = 0L;
         |for (int $i = 0; $i < $BITS; $i++) {
         |  if ($votes[$i] > 0) $fp |= (1L << $i);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHash60 = copy(child = newChild)
}
