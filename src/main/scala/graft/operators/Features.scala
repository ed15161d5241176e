package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Featurization-health audits for the training-data pipeline: the
  * calibration questions answered BEFORE a featurizer or membership
  * filter ships.
  *
  *   - q_feature_hashing — the hashing-trick (Weinberger et al.,
  *     "Feature Hashing for Large Scale Multitask Learning", ICML'09)
  *     bucket-health table: per bucket, how many distinct terms
  *     collided into it, total term frequency, and the signed-sum mass
  *     (the ICML'09 ±1 sign hash makes collision noise zero-mean — the
  *     signed column shows the cancellation actually happening). The
  *     readout that decides whether 2^b buckets suffice for the vocab.
  *   - q_bloom_fpr — Bloom-filter false-positive calibration measured
  *     on held-out probes: insert split-A terms into an (m, k) filter,
  *     probe with split-B-only terms (ground truth exact via anti-join
  *     — the oracle KNOWS which probes are true negatives), report
  *     observed FPR + bit-load. The empirical twin of
  *     q_bloom_decontaminate's assumed rate.
  *
  * Determinism: buckets/signs/bit positions all derive from the md5
  * [[Dedup.hash32]] stream — same values in both engines; every share
  * is an integer bp/ppm division on non-negatives.
  *
  * 100 TB posture: everything is vocab-keyed after one token
  * aggregate — term tables are vocab-bounded, the bit table is
  * m-bounded (broadcast), and no corpus-sized structure survives the
  * first groupBy.
  */
object Features {

  /** q_feature_hashing: bucket count (2^10) and the two hash streams. */
  private val FH_BUCKETS = 1024
  private val FH_SEED = 41
  private val FH_SIGN_SEED = 43

  /** q_bloom_fpr: filter geometry (m bits, k probes) and hash seeds. */
  private val BLOOM_M = 65536
  private val BLOOM_K = 4
  private val BLOOM_SEED = 47
  /** Corpus split: doc_id hash even → insert side A, odd → probe side B. */
  private val BLOOM_SPLIT_SEED = 53

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── hashing-trick bucket health ────────────────────────────────────
    "q_feature_hashing" -> { (s, dir) =>
      val tf = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextFunctions.tokens(lower(col("text")))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("tf_total"))
      tf.select(col("term"), col("tf_total"),
          (Dedup.hash32(FH_SEED, col("term")) % FH_BUCKETS).as("bucket"),
          when(Dedup.hash32(FH_SIGN_SEED, col("term")) % 2 === 0, 1L)
            .otherwise(-1L).as("sgn"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_terms"),
          sum(col("tf_total")).as("tf_sum"),
          sum(col("sgn") * col("tf_total")).as("signed_tf_sum"))
        .withColumn("has_collision", (col("n_terms") >= 2).cast("int"))
    },

    // ── Bloom false-positive calibration on held-out probes ────────────
    "q_bloom_fpr" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          (Dedup.hash32(BLOOM_SPLIT_SEED, col("doc_id").cast("string"))
            % 2 === 0).as("side_a"),
          col("text"))
      val terms = d.select(col("side_a"),
          explode(TextFunctions.tokens(lower(col("text")))).as("term"))
        .distinct()
      val aTerms = terms.filter(col("side_a")).select(col("term"))
      // true negatives: terms seen ONLY on the probe side
      val probes = terms.filter(!col("side_a")).select(col("term"))
        .join(aTerms, Seq("term"), "left_anti")
      val ks = s.range(0, BLOOM_K).select(col("id").as("i"))
      def positions(t: DataFrame): DataFrame =
        t.crossJoin(broadcast(ks))
          .select(col("term"),
            (Dedup.hash32(BLOOM_SEED, concat(col("i").cast("string"),
              lit("#"), col("term"))) % BLOOM_M).as("pos"))
      val bits = positions(aTerms).select(col("pos")).distinct()
      val nBits = bits.agg(count(lit(1)).as("bits_set"))
      val nKeys = aTerms.agg(count(lit(1)).as("n_keys"))
      // a probe false-positives iff ALL k positions are set
      val fp = positions(probes)
        .join(broadcast(bits), Seq("pos"), "left_semi")
        .groupBy(col("term")).agg(count(lit(1)).as("hits"))
        .filter(col("hits") === BLOOM_K)
        .agg(count(lit(1)).as("n_fp"))
      val nProbes = probes.agg(count(lit(1)).as("n_probes"))
      nKeys.crossJoin(broadcast(nBits))
        .crossJoin(broadcast(nProbes)).crossJoin(broadcast(fp))
        .select(lit(BLOOM_M.toLong).as("m_bits"),
          lit(BLOOM_K.toLong).as("k_hashes"),
          col("n_keys"), col("bits_set"),
          expr(s"bits_set * 10000 div $BLOOM_M").as("load_bp"),
          col("n_probes"), col("n_fp"),
          expr("CASE WHEN n_probes = 0 THEN CAST(NULL AS BIGINT)" +
            " ELSE n_fp * 1000000 div n_probes END").as("fpr_ppm"))
    })

  val oracle: Map[String, String] = Map(

    "q_feature_hashing" -> {
      val b = Dedup.hash32Sql(FH_SEED, "term")
      val sg = Dedup.hash32Sql(FH_SIGN_SEED, "term")
      s"""WITH toks AS (SELECT doc_id,
         |    string_split_regex(trim(lower(text)), '\\s+') AS t
         |  FROM documents WHERE length(trim(text)) > 0),
         |tf AS (SELECT tok AS term, count(*) AS tf_total
         |  FROM toks, unnest(t) AS u(tok) GROUP BY 1),
         |h AS (SELECT term, tf_total, ($b) % $FH_BUCKETS AS bucket,
         |    CASE WHEN ($sg) % 2 = 0 THEN 1 ELSE -1 END AS sgn
         |  FROM tf)
         |SELECT bucket, count(*) AS n_terms,
         |  CAST(sum(tf_total) AS BIGINT) AS tf_sum,
         |  CAST(sum(sgn * tf_total) AS BIGINT) AS signed_tf_sum,
         |  CAST(count(*) >= 2 AS INT) AS has_collision
         |FROM h GROUP BY 1""".stripMargin
    },

    "q_bloom_fpr" -> {
      val split = Dedup.hash32Sql(BLOOM_SPLIT_SEED,
        "CAST(doc_id AS VARCHAR)")
      val pos = Dedup.hash32Sql(BLOOM_SEED,
        "CAST(i AS VARCHAR) || '#' || term")
      s"""WITH d AS (SELECT doc_id, ($split) % 2 = 0 AS side_a, text
         |  FROM documents),
         |toks AS (SELECT side_a,
         |    string_split_regex(trim(lower(text)), '\\s+') AS t
         |  FROM d WHERE length(trim(text)) > 0),
         |terms AS (SELECT DISTINCT side_a, tok AS term
         |  FROM toks, unnest(t) AS u(tok)),
         |a AS (SELECT term FROM terms WHERE side_a),
         |probes AS (SELECT term FROM terms WHERE NOT side_a
         |  AND term NOT IN (SELECT term FROM a)),
         |ks AS (SELECT unnest(range(0, $BLOOM_K)) AS i),
         |apos AS (SELECT DISTINCT ($pos) % $BLOOM_M AS pos
         |  FROM a CROSS JOIN ks),
         |ppos AS (SELECT term, ($pos) % $BLOOM_M AS pos
         |  FROM probes CROSS JOIN ks),
         |fp AS (SELECT count(*) AS n_fp FROM (
         |  SELECT p.term FROM ppos p
         |  WHERE p.pos IN (SELECT pos FROM apos)
         |  GROUP BY p.term HAVING count(*) = $BLOOM_K) t),
         |c AS (SELECT (SELECT count(*) FROM a) AS n_keys,
         |    (SELECT count(*) FROM apos) AS bits_set,
         |    (SELECT count(*) FROM probes) AS n_probes,
         |    (SELECT n_fp FROM fp) AS n_fp)
         |SELECT CAST($BLOOM_M AS BIGINT) AS m_bits,
         |  CAST($BLOOM_K AS BIGINT) AS k_hashes,
         |  CAST(n_keys AS BIGINT) AS n_keys,
         |  CAST(bits_set AS BIGINT) AS bits_set,
         |  CAST(bits_set * 10000 // $BLOOM_M AS BIGINT) AS load_bp,
         |  CAST(n_probes AS BIGINT) AS n_probes,
         |  CAST(n_fp AS BIGINT) AS n_fp,
         |  CASE WHEN n_probes = 0 THEN CAST(NULL AS BIGINT)
         |    ELSE CAST(n_fp * 1000000 // n_probes AS BIGINT)
         |  END AS fpr_ppm
         |FROM c""".stripMargin
    })
}
