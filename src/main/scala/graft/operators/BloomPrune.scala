package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join pruning — the scale path for "does this row's
  * key appear in that (much smaller) key set?" when the probe side is
  * enormous and the build side is merely large-ish.
  *
  * A plain semi-join shuffles EVERY probe-side key; broadcasting the
  * exact key set dies once it outgrows the broadcast limit. The bloom
  * filter is the middle path Spark itself uses for runtime row-group
  * filtering (InjectRuntimeFilter): a bits-sized sketch of the build
  * side, embedded in the plan as a literal, probed map-side with zero
  * shuffle. False positives only — so a downstream EXACT join on the
  * survivors keeps results exact while its shuffle volume shrinks from
  * |probe| to |matches| + fpp·|probe|.
  *
  * We reuse Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
  * expressions (exposed as `bloom_agg` / `bloom_contains` via
  * [[graft.plans.GraftExtensions]]) rather than hand-rolling a sketch:
  * the probe is codegen'd and the agg's partial buffers merge by OR.
  *
  * 100 TB numbers: a 10M-key benchmark set at 1 % fpp is a ~12 MB
  * literal — broadcast once per stage, same order as a broadcast-hash
  * dim table — while the pruned shuffle saves |corpus shingles| ≈
  * trillions of rows. At sf0.01 the measured prefilter keeps ~7 % of
  * corpus shingles (BloomPruneSpec).
  */
object BloomPrune {

  /** Build a serialized bloom filter over a LONG key column in one
    * aggregate job (partials merge by OR — no driver-side inserts).
    * `n` is the expected distinct-key count; bits are sized for `fpp`.
    */
  def buildBloom(keys: DataFrame, key: Column, n: Long,
                 fpp: Double): Array[Byte] = {
    val bits = BloomFilter.optimalNumOfBits(math.max(n, 1L), fpp)
    keys.agg(call_function("bloom_agg", key, lit(math.max(n, 1L)),
        lit(bits)).as("bf"))
      .head.getAs[Array[Byte]](0)
  }

  /** Map-side probe: true ⇒ key MIGHT be in the build set (false ⇒
    * definitely not). `bloom` rides the plan as a binary literal.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    call_function("bloom_contains", lit(bloom), key)
}
