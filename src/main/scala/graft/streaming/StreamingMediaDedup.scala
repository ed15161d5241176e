package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

/** Streaming perceptual near-dup detection for MEDIA against a static
  * corpus — the multimodal twin of [[StreamingNearDup]]: binary
  * payloads arrive on a stream, each is average-hashed IN-ROW (the
  * same integer aHash the batch detector computes), its Hamming band
  * keys probe the corpus's banded index, and candidates are verified
  * in-row by exact `bit_count(xor)` — a stream-static equi-join,
  * stateless by construction, no state store, no second corpus pass.
  *
  * Banding shares ONE definition with the batch detector
  * ([[Dedup.hammingBandKeys]] — maxHamming+1 equal bands, pigeonhole
  * recall guarantee), so ingest-time and batch near-dup can never
  * disagree on candidates.
  *
  * Emission contract (the [[StreamingNearDup]] convention): one row
  * per MATCHING BAND of each verified (arrival, corpus) pair —
  * multiplicity is a pure function of the two hashes, deterministic,
  * surfaced by the gate rollup as `n_band_hits`.
  *
  * 100 TB posture: the index is (band, bkey)-keyed — bucket it on
  * write and the per-micro-batch join co-locates; a micro-batch
  * shuffles only its own band rows (batch-sized, never corpus-sized).
  */
object StreamingMediaDedup {

  val MAX_HAMMING: Int = Multimodal.MEDIA_MAX_HAMMING

  /** The static corpus index: one (band, bkey, match_id, match_hash)
    * row per band of each corpus payload's aHash.
    */
  def corpusIndex(media: DataFrame): DataFrame =
    Multimodal.aHashed(media)
      .select(col("media_id").as("match_id"), col("ahash").as("match_hash"),
        posexplode(Dedup.hammingBandKeys(col("ahash"),
          Multimodal.AHASH_BITS, MAX_HAMMING)))
      .toDF("match_id", "match_hash", "band", "bkey")

  /** (media_id, match_id, hamming, band) per band collision of each
    * arriving payload against the corpus index, exact-verified in-row
    * (hamming ≤ [[MAX_HAMMING]]); self-pairs are excluded so a corpus
    * replay surfaces exactly the symmetric closure of the batch pairs.
    */
  def mediaMatchStream(incoming: DataFrame, index: DataFrame): DataFrame =
    Multimodal.aHashed(incoming)
      .select(col("media_id"), col("ahash"),
        posexplode(Dedup.hammingBandKeys(col("ahash"),
          Multimodal.AHASH_BITS, MAX_HAMMING)))
      .toDF("media_id", "ahash", "band", "bkey")
      .join(index, Seq("band", "bkey"))
      .filter(col("media_id") =!= col("match_id"))
      .withColumn("hamming",
        bit_count(col("ahash").bitwiseXOR(col("match_hash"))))
      .filter(col("hamming") <= MAX_HAMMING)
      .select(col("media_id"), col("match_id"), col("hamming"),
        col("band"))
}
