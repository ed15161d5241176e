package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-aware equi-join by key salting.
  *
  * AQE's skew-join optimization splits oversized sort-merge partitions
  * at runtime and is the right default — but it cannot help when a
  * SINGLE key's rows must meet a non-broadcastable build side, or when
  * the skewed exchange feeds an aggregation. Explicit salting spreads
  * one hot key over `salt` reducers deterministically:
  *
  *   - the LARGE side tags each row with `pmod(hash(all columns), salt)`
  *     — deterministic (replayable, no rand()), and distributes a hot
  *     key's rows by their content;
  *   - the SMALL side is replicated once per salt bucket (explode of a
  *     salt sequence — a ×salt blowup, which is why the small side must
  *     be the bounded one);
  *   - the join key becomes (key, salt), so the shuffle hashes hot keys
  *     into `salt` distinct partitions.
  *
  * Result is row-identical to `large.join(small, keys)` (inner).
  */
object SkewJoin {

  def saltedInnerJoin(large: DataFrame, small: DataFrame,
                      keys: Seq[String], salt: Int = 16): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltCol = "__skew_salt"
    val largeSalted = large.withColumn(saltCol,
      pmod(hash(large.columns.map(col): _*), lit(salt)))
    val smallSalted = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(salt - 1))))
    largeSalted.join(smallSalted, keys :+ saltCol)
      .drop(saltCol)
  }
}
