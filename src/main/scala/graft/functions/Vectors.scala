package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `Array[Float]` embedding columns, as pure Column
  * expressions (codegen'd higher-order functions — no UDFs, no MLlib
  * vector conversions in the hot path).
  *
  * All arithmetic is promoted to double and folded sequentially
  * (`aggregate` evaluates left-to-right), so results are deterministic
  * per engine; cross-engine oracle checks compare rank order, not raw
  * float bits.
  */
object VectorFunctions {

  /** Σ a_i * b_i, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Σ a_i², accumulated in double. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double"))

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; null-safe via NaN when either norm is 0. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared Euclidean distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
}
