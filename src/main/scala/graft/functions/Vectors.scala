package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `Array[Float]` embedding columns.
  *
  * The hot-path entry points ([[cosine]], [[l2Sq]]) resolve to the
  * NATIVE codegen'd expressions in `graft.plans.VectorExpressions`
  * (registered by GraftExtensions): one fused Java loop per row. The
  * higher-order-function formulations are kept as `*Hof` — Spark's HOFs
  * are CodegenFallback (interpreted lambda dispatch per element), so
  * they serve as the readable reference implementation and the
  * equivalence oracle in specs, not the scoring loop.
  *
  * All arithmetic is promoted to double and folded left-to-right in
  * BOTH formulations, so their results are bit-identical; cross-engine
  * oracle checks compare rank order, not raw float bits.
  */
object VectorFunctions {

  /** Σ a_i * b_i, accumulated in double (HOF reference). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Σ a_i², accumulated in double (HOF reference). */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double"))

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity — native fused-loop expression. */
  def cosine(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Cosine similarity, HOF reference formulation. */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared Euclidean distance — native fused-loop expression. */
  def l2Sq(a: Column, b: Column): Column =
    call_function("l2_sq", a, b)

  /** Squared Euclidean distance, HOF reference formulation. */
  def l2SqHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Exact integer dot over `array<bigint>` — native fused-loop
    * expression (the SQ reconstruction-dot kernel).
    */
  def longDot(a: Column, b: Column): Column =
    call_function("long_dot", a, b)

  /** Integer dot, HOF reference formulation. */
  def longDotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)
}
