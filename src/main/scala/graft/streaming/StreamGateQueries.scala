package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** ORACLE-GATED Structured Streaming — the streaming operators run as
  * real streams (file source → transform → sink) inside `queries()`
  * entries, so their OUTPUT goes through the driver's DuckDB
  * rows+schema+hash gate instead of only spec pins. This upgrades the
  * "streaming twins ≡ batch" claim from a test assertion to the same
  * gate every batch operator faces.
  *
  * Harness: each query stages the events parquet into a file-source
  * directory, runs the [[StreamingEvents]] transform under
  * `Trigger.AvailableNow()` with a FRESH checkpoint (so every
  * invocation reprocesses from scratch — Verify and each Bench rep get
  * a full run), asserts the query drained, and returns the sink table.
  * The memory sink is the conformance harness only — production is the
  * same transform with a parquet/Kafka sink; rows land driver-side
  * here exactly like any gate result does.
  *
  * Determinism contract (what makes a STREAM hash-comparable to SQL):
  *   - one staged file ⇒ one data micro-batch (file source AvailableNow
  *     with no maxFilesPerTrigger), then the no-data batch finalizes
  *     the watermark at floor_ms(max event time) − delay;
  *   - windowed aggregates in append mode emit exactly the windows
  *     with `window_end_ms <= watermark_ms` — INCLUSIVE at equality
  *     (verified empirically: a watermark landing exactly on a window
  *     end emits that window);
  *   - event-time timeouts (statefulSessionize) fire on
  *     `timeout_ms < watermark_ms` — STRICT (the StreamingSpec
  *     equivalence rule);
  *   - the oracle SQL re-derives the same emission rule from
  *     `max(epoch_ms(ts))`, so both engines compute the identical
  *     emitted subset.
  *
  * 100 TB posture: these gates run the SAME code paths the unbounded
  * deployment runs — watermark-bounded state (hourly windows: one row
  * per open (window, type); sessionize: three longs per active user;
  * dedup: id cache bounded by the watermark horizon). Nothing in the
  * transform is sized by history.
  */
object StreamGateQueries {

  private val runCounter = new AtomicInteger(0)

  /** Stage base — absolute by the same contract as NeoQueries' bronze
    * path (under the repo's git-ignored target/).
    */
  private val STAGE_BASE = "/root/repo/target/stream_stage"

  /** Idempotently stage `copies` byte-identical copies of the events
    * parquet into a directory the file source can list. `copies = 2`
    * is the dedup fixture: every event arrives exactly twice.
    */
  private def stage(sfDir: String, copies: Int): String = synchronized {
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_") + s"_x$copies"
    val dir = Paths.get(s"$STAGE_BASE/$key")
    if (!Files.exists(dir.resolve("_STAGED"))) {
      Files.createDirectories(dir)
      (1 to copies).foreach { i =>
        val dst = dir.resolve(s"events_$i.parquet")
        if (!Files.exists(dst))
          Files.copy(Paths.get(s"$sfDir/events.parquet"), dst)
      }
      Files.writeString(dir.resolve("_STAGED"), "ok")
    }
    dir.toString
  }

  /** Event-time column, type-adaptive exactly like [[graft.Tables.epochMs]]
    * (the testdata generator has changed the parquet physical type
    * before): int64 nanos floor to ms; NTZ relabels under the pinned
    * UTC session; plain timestamp passes through.
    */
  private def tsCol(schema: StructType): Column =
    schema("ts").dataType match {
      case LongType =>
        expr("timestamp_millis((ts - pmod(ts, 1000000)) div 1000000)")
      case TimestampType => col("ts")
      case TimestampNTZType => col("ts").cast(TimestampType)
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other")
    }

  /** Run a streaming DataFrame to completion (AvailableNow + fresh
    * checkpoint) into a uniquely-named memory sink; return the table.
    */
  private def runToTable(s: SparkSession, out: DataFrame): DataFrame = {
    val nm = s"graft_stream_gate_${runCounter.incrementAndGet()}"
    val ckpt = Files.createTempDirectory("graft_stream_ckpt_")
    val q = out.writeStream.format("memory").queryName(nm)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    try require(q.awaitTermination(300000),
      s"stream gate $nm did not drain within 300 s")
    finally q.stop()
    s.table(nm)
  }

  private def eventsStream(s: SparkSession, dir: String,
                           copies: Int = 1): DataFrame = {
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    s.readStream.schema(schema).parquet(stage(dir, copies))
      .select(col("event_id"), tsCol(schema).as("ts"), col("user_id"),
        col("event_type"), col("value"))
  }

  // ────────────────────────────────────────────────────────────────────
  // Queries
  // ────────────────────────────────────────────────────────────────────

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── watermarked tumbling-window counts, append-mode emission ───────
    // The finalized subset: windows whose end the final watermark
    // passed (inclusive). total_value is deliberately NOT in the gate
    // projection — it is a raw double sum whose partial order streaming
    // does not pin; the exact-count contract is what append-mode
    // finalization guarantees.
    "q_stream_hourly_counts" -> { (s, dir) =>
      import s.implicits._
      val res = runToTable(s,
        StreamingEvents.hourlyCounts(eventsStream(s, dir)))
      res.select(unix_millis(col("window_start")).as("window_start_ms"),
        col("event_type"), col("n"))
    },

    // ── custom flatMapGroupsWithState sessionization ───────────────────
    // The full state machine under the hash gate: sessions closed by an
    // in-stream gap emit in the data batch; the per-user OPEN session
    // emits via event-time timeout iff (last + gap) < final watermark.
    "q_stream_sessionize" -> { (s, dir) =>
      import s.implicits._
      runToTable(s, StreamingEvents.statefulSessionize(
        eventsStream(s, dir).as[StreamingEvents.Event]).toDF())
    },

    // ── dropDuplicatesWithinWatermark under REAL duplication ───────────
    // The fixture stages every event TWICE (two byte-identical files in
    // one micro-batch); the stream must emit exactly one row per
    // event_id — n_rows == n_ids == the single-copy distinct count per
    // type, which is what the oracle computes from ONE copy.
    "q_stream_dedup" -> { (s, dir) =>
      val ded = runToTable(s,
        StreamingEvents.dedupStream(eventsStream(s, dir, copies = 2)))
      ded.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("event_id")).as("n_ids"))
    },

    // ── first-seen identity state (new vs returning), daily rollup ─────
    // NoTimeout keyed state: each user's first-seen day decides
    // new/returning; the daily rollup over the emitted stream must
    // equal the batch first-day derivation exactly.
    "q_stream_new_vs_returning" -> { (s, dir) =>
      import s.implicits._
      val out = runToTable(s, StreamingEvents.newVsReturningStream(
        eventsStream(s, dir).as[StreamingEvents.Event]).toDF())
      out.groupBy(col("day"))
        .agg(count(lit(1)).as("n_active"),
          sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"))
    }
  )

  // ────────────────────────────────────────────────────────────────────
  // DuckDB oracle twins — batch SQL + the exact emission rule
  // ────────────────────────────────────────────────────────────────────

  val oracle: Map[String, String] = Map(

    "q_stream_hourly_counts" ->
      """WITH e AS (SELECT epoch_ms(ts) AS ms, event_type FROM events),
        |mx AS (SELECT max(ms) AS max_ms FROM e),
        |w AS (SELECT (ms // 3600000) * 3600000 AS window_start_ms,
        |    event_type, count(*) AS n
        |  FROM e GROUP BY 1, 2)
        |SELECT w.window_start_ms, w.event_type, w.n FROM w, mx
        |WHERE w.window_start_ms + 3600000 <= mx.max_ms - 7200000""".stripMargin,

    "q_stream_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
        |mx AS (SELECT max(ms) AS max_ms FROM e),
        |flagged AS (SELECT *,
        |  CASE WHEN lag(ms) OVER w IS NULL
        |         OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms ASC, event_id ASC)),
        |sessions AS (SELECT *,
        |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms ASC,
        |    event_id ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM flagged),
        |agg AS (SELECT user_id, session_idx,
        |    min(ms) AS session_start_ms, max(ms) AS session_end_ms,
        |    count(*) AS n_events
        |  FROM sessions GROUP BY 1, 2),
        |last AS (SELECT user_id, max(session_idx) AS max_idx
        |  FROM agg GROUP BY 1)
        |SELECT a.user_id, a.session_start_ms, a.session_end_ms, a.n_events
        |FROM agg a JOIN last l ON a.user_id = l.user_id, mx
        |WHERE a.session_idx <> l.max_idx
        |   OR a.session_end_ms + 1800000 < mx.max_ms - 7200000""".stripMargin,

    "q_stream_dedup" ->
      """SELECT event_type, count(*) AS n_rows,
        |  count(DISTINCT event_id) AS n_ids
        |FROM events GROUP BY 1""".stripMargin,

    "q_stream_new_vs_returning" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        |d AS (SELECT DISTINCT user_id, day FROM e),
        |f AS (SELECT user_id, min(day) AS first_day FROM d GROUP BY 1)
        |SELECT d.day, count(*) AS n_active,
        |  CAST(sum(CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_new
        |FROM d JOIN f ON d.user_id = f.user_id GROUP BY 1""".stripMargin
  )
}
