package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Table-operations surface under the ORACLE gate: the
  * [[VersionedTable]] Delta-flavored lifecycle (overwrite → MERGE →
  * DELETE, then time-travel reads of every version) exercised as a
  * real on-disk table inside a `queries()` entry, so the transaction
  * slice's OUTPUT faces the same rows+schema+hash gate as every
  * relational operator — not only OpsSpec's conformance pins.
  *
  * Harness (the NeoQueries staging convention): each invocation
  * REBUILDS the staged table from scratch — delete, then three
  * committed versions derived deterministically from the orders
  * parquet — so Verify and every Bench rep gate the identical
  * lifecycle end-to-end (idempotent by construction: the rebuild IS
  * the operator under test).
  *
  *   v1 = overwrite(orderkey % 3 ∈ {0,1})              — CREATE
  *   v2 = merge(orderkey % 3 ∈ {1,2}, cents+1, by key) — MERGE INTO
  *   v3 = delete(orderkey % 5 = 0)                     — DELETE WHERE
  *
  * The gate reads ALL THREE versions back via time travel and reduces
  * each to (version, n_rows, n_keys, sum_cents); the DuckDB twin
  * re-derives the same three snapshots relationally (merge = incoming
  * ∪ existing-not-matched). History timestamps/bytes are
  * machine-dependent and stay out of the projection (OpsSpec covers
  * them).
  *
  * 100 TB posture: mutations are [[MergeUpsert]] key-shuffled merges +
  * O(1) directory renames; the gate aggregates are one pass per
  * version. The staged fixture is sf-sized, but nothing in the code
  * path is sized by history beyond the `retain` window.
  */
object OpsGate {

  /** Stage `df` as exactly `least(64, n_rows)` NON-EMPTY small parquet
    * files — the q_compaction fixture whose before-count the oracle
    * derives.
    *
    * Round-robin starts each INPUT partition at its own offset, so a
    * multi-partition sub-64-row input could collide partitions and
    * write fewer than least(64, n) files (ADVICE r13); from ONE input
    * partition the fill is strictly sequential. A bare
    * `coalesce(1).repartition(64)` does NOT guarantee that:
    * CollapseRepartition rewrites shuffle-over-noshuffle to drop the
    * coalesce entirely (found by review, round 14). The localCheckpoint
    * between them materializes the single partition as a LogicalRDD
    * leaf no optimizer rule sees through — OpsSpec pins the non-empty
    * file count on an adversarial multi-partition sub-64-row input.
    * (The writer may additionally emit one 0-row partition-0 file as
    * the schema carrier; counters must count non-empty files.)
    */
  private[graft] def stageSmallFiles(df: DataFrame, path: String): Unit =
    df.coalesce(1).localCheckpoint().repartition(64).write.parquet(path)

  // derived from user.dir (SPARK_GRAFT_STAGE_DIR overrides) so the
  // gate works on any checkout, not just /root/repo (ADVICE r10)
  private val STAGE_BASE = graft.StageDirs.stable("ops_gate")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_time_travel" -> { (s, dir) =>
      val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
      // the table gets its OWN parent dir: VersionedTable keeps
      // displaced versions as dot-prefixed siblings of the path, so a
      // full reset must delete the parent — and a SHARED parent would
      // clobber sibling gates' staged tables mid-plan
      val path = s"$STAGE_BASE/$key/time_travel/orders_v"
      val p = new Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      // rebuild from scratch: the lifecycle is the operator under test
      if (fs.exists(p.getParent)) fs.delete(p.getParent, true)
      val base = Tables.load(s, dir, "orders")
        .select(col("o_orderkey").cast("long").as("k"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("cents"))
      val t = VersionedTable(s, path, retain = 3)
      t.overwrite(base.filter(col("k") % 3 < 2))
      t.merge(base.filter(col("k") % 3 > 0)
        .select(col("k"), (col("cents") + 1).as("cents")), Seq("k"))
      t.delete(col("k") % 5 === 0)
      def snap(v: Long): DataFrame =
        t.readAt(v).agg(count(lit(1)).as("n_rows"),
            countDistinct(col("k")).as("n_keys"),
            sum(col("cents")).as("sum_cents"))
          .select(lit(v).as("version"), col("n_rows"), col("n_keys"),
            col("sum_cents"))
      snap(1).unionByName(snap(2)).unionByName(snap(3))
    },

    // ── model registry: publish → time-travel load → serve ─────────────
    // The operational half of train-offline/serve-online: v1 = the
    // sampled-slice quality fit, v2 = the full fit, each PUBLISHED as
    // a (param, idx, value) version of a real on-disk VersionedTable;
    // the gate then time-travel-LOADS both versions and scores the
    // corpus with the LOADED constants. Any loss in the publish/load
    // roundtrip (a row, a sign, an index) shifts a score and breaks
    // the hash against the oracle's twin trainer chains.
    "q_model_registry" -> { (s, dir) =>
      val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
      // own parent dir (version siblings live beside the path; a
      // shared parent would clobber sibling gates' staged tables)
      val path = s"$STAGE_BASE/$key/model_registry/quality_logit"
      val p = new Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      // rebuild from scratch: the publish lifecycle is under test
      if (fs.exists(p.getParent)) fs.delete(p.getParent, true)
      val docs = Tables.load(s, dir, "documents")
      // ONE persisted copy of the quality-feature projection (r16):
      // both trainers and both serving passes below re-derive
      // qualityBpOf(docs) internally — identical subplans, so the
      // cache manager substitutes this table into all four and the
      // regex-heavy feature pass over the corpus is paid once, not 4×.
      // Results are unchanged (the projection is deterministic).
      graft.CacheRegistry.register(
        TextQueries.qualityBpOf(docs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val t = VersionedTable(s, path, retain = 3)
      ModelRegistry.publishLogit(s, t,
        TextQueries.fitQualityModelSliced(docs,
          TextQueries.qualitySliceGate))
      ModelRegistry.publishLogit(s, t, TextQueries.fitQualityModel(docs))
      def serve(v: Long): DataFrame =
        graft.streaming.StreamingQuality
          .scoreStream(docs, ModelRegistry.loadLogitAt(t, v))
          .groupBy(col("verdict"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("score_m")).as("score_sum_m"))
          .select(lit(v).as("version"), col("verdict"), col("n_docs"),
            col("score_sum_m"))
      serve(1).unionByName(serve(2))
    },

    // ── model registry, vector family: the published novelty cover ─────
    // The k-center cover (seed ids, quantized vectors, maximin radii)
    // published on the same (param, idx, value) protocol, loaded back,
    // and served: every per-point (nearest seed, d², band) from the
    // LOADED cover must equal the direct fit — the q_stream_novelty
    // ground truth, now reached through parquet instead of the JVM.
    "q_novelty_registry" -> { (s, dir) =>
      val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val path = s"$STAGE_BASE/$key/novelty_registry/novelty_cover"
      val p = new Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p.getParent)) fs.delete(p.getParent, true)
      val emb = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val t = VersionedTable(s, path, retain = 3)
      ModelRegistry.publishNovelty(t, VectorQueries.noveltyModelRows(emb))
      VectorQueries.noveltyScoreFromRows(emb,
        ModelRegistry.loadRowsAt(t, 1))
    },

    // ── small-files compaction under the hash gate ─────────────────────
    // The ops surface that was spec-only through round 11: stage the
    // events table as 64 deliberate small files, run the crash-safe
    // compaction swap (same lock/version/recover protocol as the
    // merge), and gate that (a) CONTENT survives byte-exactly — the
    // per-type rollup equals the oracle's over the source parquet —
    // and (b) the file counts are the deterministic least(64, n_rows) →
    // 1 (round-robin repartition writes no file for an empty partition,
    // so the oracle derives the before-count from the row count instead
    // of pinning a literal 64 that a sub-64-row fixture would break;
    // targetBytes is sized so the planner picks one file, and parquet
    // byte sizes never enter the projection). Crash windows/locks stay
    // spec-pinned (CompactionSpec + CrashRecoveryScaleSpec cover them).
    "q_compaction" -> { (s, dir) =>
      val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val path = s"$STAGE_BASE/$key/events_small"
      val p = new Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true) // rebuild: the lifecycle IS the test
      stageSmallFiles(
        Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents")),
        path)
      // count NON-EMPTY files from parquet FOOTER row counts — a
      // metadata read (one footer per file), not a data scan; the
      // pre-r15 input_file_name().distinct() form re-read the whole
      // table twice per gate run (ADVICE r14). FileFormatWriter always
      // materializes partition 0 — even empty — as the schema carrier,
      // so a sub-64-row staging write leaves one 0-row file the
      // least(64, n) contract must not count.
      def parts(): Long =
        fs.listStatus(p).count { st =>
          st.isFile && st.getPath.getName.endsWith(".parquet") && {
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(
              org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(
                st, s.sparkContext.hadoopConfiguration))
            try r.getRecordCount > 0 finally r.close()
          }
        }.toLong
      val before = parts()
      Compaction.compact(s, path, targetBytes = Long.MaxValue / 4)
      val after = parts()
      s.read.parquet(path)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("event_id")).as("n_ids"),
          sum(col("cents")).as("sum_cents"))
        .withColumn("n_files_before", lit(before))
        .withColumn("n_files_after", lit(after))
    })

  val oracle: Map[String, String] = Map(

    // the registry roundtrip is lossless by contract, so the ground
    // truth is the two trainer chains scored directly
    "q_model_registry" -> TextQueries.modelRegistrySql,

    // same contract for the vector family: the published cover must
    // serve exactly the fitted one, so the ground truth is the
    // q_stream_novelty per-point assignment
    "q_novelty_registry" -> VectorQueries.streamNoveltySql,

    "q_time_travel" ->
      """WITH base AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |v1 AS (SELECT * FROM base WHERE k % 3 < 2),
        |inc AS (SELECT k, cents + 1 AS cents FROM base WHERE k % 3 > 0),
        |v2 AS (SELECT * FROM inc
        |  UNION ALL SELECT * FROM v1
        |  WHERE k NOT IN (SELECT k FROM inc)),
        |v3 AS (SELECT * FROM v2 WHERE NOT (k % 5 = 0))
        |SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_rows,
        |  count(DISTINCT k) AS n_keys,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents FROM v1
        |UNION ALL SELECT 2, count(*), count(DISTINCT k),
        |  CAST(sum(cents) AS BIGINT) FROM v2
        |UNION ALL SELECT 3, count(*), count(DISTINCT k),
        |  CAST(sum(cents) AS BIGINT) FROM v3""".stripMargin,

    "q_compaction" ->
      """SELECT event_type, count(*) AS n_rows,
        |  count(DISTINCT event_id) AS n_ids,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  CAST(least(64, (SELECT count(*) FROM events)) AS BIGINT)
        |    AS n_files_before,
        |  CAST(1 AS BIGINT) AS n_files_after
        |FROM events GROUP BY 1""".stripMargin)
}
