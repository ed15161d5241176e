package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{BronzeIngest, Layout, NeoFixture}
import graft.streaming.{StreamingEvents, StreamingPipeline}
import graft.streaming.StreamingEvents.Event

/** Structured-Streaming specs: the continuous medallion pipeline over
  * bronze files, and the event-stream operators via MemoryStream.
  */
class StreamingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(minute * 60000L)

  test("neardupStream invariants: symmetric closure, band-bounded " +
    "multiplicity, near-dups found") {
    // The gate (q_stream_neardup) hash-checks the exact rollup; this
    // pin asserts the STRUCTURAL contracts on it: the fixture streams
    // the corpus against itself, so (a) matches exist, (b) every match
    // is mutual (Jaccard is symmetric, banding is shared), so the
    // match-count total is even, and (c) band hits per pair are capped
    // by the band count — more would mean duplicate emission beyond
    // the documented multiplicity.
    val out = graft.streaming.StreamGateQueries
      .queries("q_stream_neardup")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty, "no near-dups surfaced from the fixture")
    val totalMatches = out.map(_.getAs[Long]("n_matches")).sum
    assert(totalMatches % 2 == 0,
      s"asymmetric match closure: total $totalMatches is odd")
    out.foreach { r =>
      assert(r.getAs[Long]("n_band_hits") <=
        r.getAs[Long]("n_matches") *
          graft.streaming.StreamingNearDup.BANDS,
        s"band multiplicity exceeded the cap: $r")
    }
  }

  test("neardupStreamExactlyOnce: a multi-band collision emits one row " +
    "per pair under the watermarked dedup") {
    import graft.streaming.StreamingNearDup
    // corpus doc 100 and incoming doc 1 are byte-identical ⇒ all 4
    // bands collide. The base transform emits one row PER BAND (the
    // gate's documented multiplicity); the production variant must
    // collapse them to exactly one (doc_id, match_id) row.
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq((100L, text)).toDF("doc_id", "text")
    val index = StreamingNearDup.corpusIndex(corpus)
    val in = MemoryStream[(Long, Timestamp, String)](spark)
    val q = StreamingNearDup.neardupStreamExactlyOnce(
        in.toDF().toDF("doc_id", "ingest_ts", "text"), index,
        "ingest_ts", "10 minutes")
      .writeStream.format("memory").queryName("nd_once")
      .outputMode("append").start()
    in.addData((1L, ts(1000), text))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("nd_once")
      .select(col("doc_id"), col("match_id"), col("jaccard_bp"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 100L, 10000L)),
      s"expected exactly one full-jaccard match row, got: $out")
    graft.CacheRegistry.releaseAll()
  }

  test("streaming pipeline: bronze files -> silver + gold, incremental") {
    val layout = Layout(Files.createTempDirectory("graft-stream").toString)
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    BronzeIngest.writeRaw(spark, layout, NeoFixture.day1Date, NeoFixture.day1)
    StreamingPipeline.start(spark, layout, ckpt).awaitTermination()
    assert(spark.read.parquet(layout.silverAsteroids).count() === 4)
    assert(spark.read.parquet(layout.gold("dim_asteroid")).count() === 3)

    // second document arrives: only the new file is processed
    BronzeIngest.writeRaw(spark, layout, NeoFixture.day2Date, NeoFixture.day2)
    StreamingPipeline.start(spark, layout, ckpt).awaitTermination()
    assert(spark.read.parquet(layout.silverAsteroids).count() === 7)
    // Apophis re-observed, merged not duplicated
    assert(spark.read.parquet(layout.gold("dim_asteroid")).count() === 4)
    assert(spark.read.parquet(layout.gold("fact_asteroid_approach"))
      .count() === 7)
  }

  test("streaming silver is replay-idempotent (exactly-once under crash replay)") {
    val layout = Layout(Files.createTempDirectory("graft-replay").toString)
    val ckpt1 = Files.createTempDirectory("graft-ckpt1").toString
    BronzeIngest.writeRaw(spark, layout, NeoFixture.day1Date, NeoFixture.day1)
    StreamingPipeline.start(spark, layout, ckpt1).awaitTermination()
    val first = spark.read.parquet(layout.silverAsteroids)
      .orderBy("neo_reference_id", "approach_epoch").collect().toSeq
    assert(first.size === 4)
    // simulate the worst replay: the sink write landed but the checkpoint
    // commit was lost entirely (fresh checkpoint reprocesses every file).
    // Round 2's blind append would double silver to 8 rows here; the
    // keyed merge + dynamic partition overwrite must converge to the
    // identical table instead.
    val ckpt2 = Files.createTempDirectory("graft-ckpt2").toString
    StreamingPipeline.start(spark, layout, ckpt2).awaitTermination()
    val second = spark.read.parquet(layout.silverAsteroids)
      .orderBy("neo_reference_id", "approach_epoch").collect().toSeq
    assert(second === first)
  }

  test("attributionJoin: stream-stream join matches within the time bound") {
    val trig = MemoryStream[Event](spark)
    val act = MemoryStream[Event](spark)
    val q = StreamingEvents.attributionJoin(trig.toDF(), act.toDF(),
        withinMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    // times offset from epoch 0: the initial watermark IS epoch 0, and
    // rows AT the watermark sit on the late/eviction boundary
    trig.addData(
      Event(1, ts(1000), 1, "click", 0.0),
      Event(2, ts(1000), 2, "click", 0.0))
    act.addData(
      Event(101, ts(1010), 1, "buy", 9.0), // within 30 min of trigger 1
      Event(102, ts(1045), 2, "buy", 9.0), // outside the 30-min bound
      Event(103, ts(1005), 3, "buy", 9.0)) // no trigger for this user
    q.processAllAvailable()
    q.stop()
    val out = spark.table("attr")
      .select(col("user_id"), col("trigger_id"), col("action_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 1L, 101L)))
  }

  test("attributionJoinLeftOuter: unmatched triggers null-pad after eviction") {
    val trig = MemoryStream[Event](spark)
    val act = MemoryStream[Event](spark)
    val q = StreamingEvents.attributionJoinLeftOuter(trig.toDF(),
        act.toDF(), withinMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("attr_lo")
      .outputMode("append").start()
    trig.addData(
      Event(1, ts(1000), 1, "click", 0.0),  // will convert
      Event(2, ts(1000), 2, "click", 0.0))  // never converts
    act.addData(
      Event(101, ts(1010), 1, "buy", 9.0))
    q.processAllAvailable()
    // the unmatched trigger must NOT be emitted yet: an action could
    // still arrive until the watermark passes trigger_ts + 30 min
    val early = spark.table("attr_lo")
      .select(col("trigger_id")).as[Long].collect().toSet
    assert(early === Set(1L))
    // advance event time far past every bound ON BOTH SIDES: the
    // global watermark is the MIN over all inputs (watermark =
    // min(max_ts) - 2h), so a stalled trigger stream would hold back
    // eviction forever
    trig.addData(Event(998, ts(1000 + 60 * 5), 8, "click", 0.0))
    act.addData(Event(999, ts(1000 + 60 * 5), 9, "buy", 1.0))
    q.processAllAvailable()
    // one more batch so the new watermark triggers state eviction
    trig.addData(Event(1001, ts(1000 + 60 * 5 + 1), 8, "click", 0.0))
    act.addData(Event(1000, ts(1000 + 60 * 5 + 1), 9, "buy", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("attr_lo")
      .select(col("trigger_id"), col("action_id")).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    // trigger 2 null-pads after eviction; the late watermark-advancing
    // triggers (998, 1001) are themselves still unmatched-but-young,
    // so they must NOT appear
    assert(out === Set((1L, Some(101L)), (2L, None)))
  }

  test("crash leftovers in the silver root are invisible to partition discovery") {
    val layout = Layout(Files.createTempDirectory("graft-leftover").toString)
    val ckpt = Files.createTempDirectory("graft-ckpt3").toString
    BronzeIngest.writeRaw(spark, layout, NeoFixture.day1Date, NeoFixture.day1)
    StreamingPipeline.start(spark, layout, ckpt).awaitTermination()
    val before = spark.read.parquet(layout.silverAsteroids).count()
    // simulate a crashed swap: a dot-prefixed tmp dir with real parquet
    // rows sits next to the partitions. Discovery must skip it — an
    // unhidden name would surface as a bogus partition value and
    // double-count its rows.
    val leftover = s"${layout.silverAsteroids}/.approach_date=junk__tmp_swap"
    spark.read.parquet(layout.silverAsteroids).drop("approach_date")
      .write.parquet(leftover)
    assert(spark.read.parquet(layout.silverAsteroids).count() === before)
  }

  test("hourlyCounts: watermarked tumbling windows finalize in append mode") {
    val in = MemoryStream[Event](spark)
    val q = StreamingEvents.hourlyCounts(in.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()
    in.addData(
      Event(1, ts(10), 1, "click", 1.0),
      Event(2, ts(50), 1, "click", 2.0),
      Event(3, ts(70), 2, "view", 5.0))
    q.processAllAvailable()
    // advance watermark far enough to close hour 0 and hour 1
    in.addData(Event(4, ts(400), 1, "click", 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("hourly")
      .select(col("window_start").cast("long"), col("event_type"), col("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(out === Set((0L, "click", 2L), (3600L, "view", 1L)))
  }

  test("sessionWindows: 30-minute gap splits sessions") {
    val in = MemoryStream[Event](spark)
    val q = StreamingEvents.sessionWindows(in.toDF())
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    // user 1: events at 0,10 (one session), then 60 (new session)
    in.addData(
      Event(1, ts(0), 1, "a", 1.0),
      Event(2, ts(10), 1, "a", 1.0),
      Event(3, ts(60), 1, "a", 1.0))
    q.processAllAvailable()
    in.addData(Event(9, ts(500), 2, "a", 0.0)) // advance watermark
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess")
      .filter(col("user_id") === 1)
      .select(col("n_events")).as[Long].collect().toSeq.sorted
    assert(out === Seq(1L, 2L))
  }

  test("statefulSessionize: custom state closes sessions on gap timeout") {
    val in = MemoryStream[Event](spark)
    val q = StreamingEvents.statefulSessionize(in.toDS())
      .writeStream.format("memory").queryName("statesess")
      .outputMode("append").start()
    // NOTE: events start at minute 1, not 0 — a row with event time 0
    // equals the stream's initial watermark and Spark's late-data filter
    // drops it before the state function ever sees it.
    in.addData(
      Event(1, ts(1), 7, "a", 1.0),
      Event(2, ts(6), 7, "a", 1.0),
      Event(3, ts(90), 7, "a", 1.0)) // closes first session in-batch
    q.processAllAvailable()
    in.addData(Event(4, ts(600), 8, "a", 0.0)) // watermark → timeout fires
    q.processAllAvailable()
    q.stop()
    val out = spark.table("statesess")
      .select(col("session_start_ms"), col("n_events"))
      .as[(Long, Long)].collect().toSet
    // session 1: events 1,2 (min 1..6); session 2: event 3 closed by timeout
    assert(out.contains((60000L, 2L)))
    assert(out.contains((90L * 60000L, 1L)))
  }

  test("statefulSessionize over the REAL events parquet (file stream) ≡ " +
    "batch sessionize minus still-open sessions") {
    // end-to-end through the regenerated testdata's physical timestamp
    // type: file-stream read → cast to TimestampType (UTC session) →
    // typed Event → stateful sessionize. One AvailableNow batch carries
    // every event (each user's non-final sessions close in-batch), then
    // the advanced watermark (max event time − 2 h) triggers a final
    // no-data batch whose event-time timeouts also close each user's
    // LAST session when it ended more than the gap before the
    // watermark — the batch truth below mirrors exactly that closure
    // rule, so `got === expected` pins the full emission contract.
    import org.apache.spark.sql.expressions.Window
    val src = "/root/testdata/sf0.001/events.parquet"
    val ev = eventsWithMs(src)
    val w = Window.partitionBy("user_id")
      .orderBy(col("ms").asc, col("event_id").asc)
    val sess = ev.withColumn("prev", lag(col("ms"), 1).over(w))
      .withColumn("new_s", when(col("prev").isNull ||
        col("ms") - col("prev") > 1800000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ms")).as("session_start_ms"),
        max(col("ms")).as("session_end_ms"),
        count(lit(1)).as("n_events"))
    val lastSid = sess.groupBy(col("user_id")).agg(max(col("sid")).as("maxsid"))
    val maxMs = ev.agg(max(col("ms"))).head().getLong(0)
    val wmark = maxMs - 7200000L // final watermark: max event time − 2 h
    val expected = sess.join(lastSid, "user_id")
      .filter(col("sid") =!= col("maxsid") ||
        (col("session_end_ms") + lit(1800000L)) < wmark)
      .select(col("user_id"), col("session_start_ms"),
        col("session_end_ms"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(expected.nonEmpty)

    // file streams list directories: stage the single parquet file
    val streamDir = Files.createTempDirectory("graft_evstream_")
    Files.copy(java.nio.file.Paths.get(src),
      streamDir.resolve("events.parquet"))
    val schema = spark.read.parquet(src).schema
    val evS = spark.readStream.schema(schema).parquet(streamDir.toString)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val q = StreamingEvents.statefulSessionize(evS)
      .writeStream.format("memory").queryName("real_sess")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    // AvailableNow terminates on its own — but ASSERT it did: on a slow
    // box a timed-out wait would silently compare a PARTIAL table
    try assert(q.awaitTermination(180000),
      "statefulSessionize query did not drain within 180 s")
    finally q.stop()
    val got = spark.table("real_sess")
      .select(col("user_id"), col("session_start_ms"),
        col("session_end_ms"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("newVsReturningStream over the REAL events parquet ≡ " +
    "batch q_new_vs_returning daily rollup") {
    val sf = "/root/testdata/sf0.001"
    val src = s"$sf/events.parquet"
    val expected = operators.EventQueries
      .queries("q_new_vs_returning")(spark, sf)
      .select(col("day"), col("n_active"), col("n_new"))
      .as[(Long, Long, Long)].collect().toSet
    assert(expected.nonEmpty)

    val streamDir = Files.createTempDirectory("graft_nvrstream_")
    Files.copy(java.nio.file.Paths.get(src),
      streamDir.resolve("events.parquet"))
    val schema = spark.read.parquet(src).schema
    val evS = spark.readStream.schema(schema).parquet(streamDir.toString)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val q = StreamingEvents.newVsReturningStream(evS)
      .writeStream.format("memory").queryName("real_nvr")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    // see statefulSessionize above: a timed-out wait must FAIL, not
    // compare whatever partial table exists at 180 s
    try assert(q.awaitTermination(180000),
      "newVsReturning query did not drain within 180 s")
    finally q.stop()
    val got = spark.table("real_nvr")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("funnelStream: ordered advancement across batches with late-gate refinement") {
    val in = MemoryStream[Event](spark)
    val q = StreamingEvents.funnelStream(in.toDS(),
        Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    // batch 1: u1 views (click@5 < view@10 must NOT advance);
    // u2 clicks with no view; u3 completes view+click
    in.addData(
      Event(1, ts(10), 1, "view", 0.0), Event(2, ts(5), 1, "click", 0.0),
      Event(3, ts(5), 2, "click", 0.0),
      Event(4, ts(40), 3, "view", 0.0), Event(5, ts(50), 3, "click", 0.0))
    q.processAllAvailable()
    // batch 2: u1 clicks late-but-valid then purchases BEFORE the click
    // gate (no advance); u2 finally views; u3's LATE click@45 (≥ view
    // gate 40, < recorded 50) lowers the gate so purchase@47 qualifies
    in.addData(
      Event(6, ts(20), 1, "click", 0.0), Event(7, ts(15), 1, "purchase", 0.0),
      Event(8, ts(10), 2, "view", 0.0),
      Event(9, ts(45), 3, "click", 0.0), Event(10, ts(47), 3, "purchase", 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("funnel")
      .as[(Long, Int, String)].collect().toSet
    assert(out === Set(
      (1L, 1, "view"), (1L, 2, "click"),
      (2L, 1, "view"),
      (3L, 1, "view"), (3L, 2, "click"), (3L, 3, "purchase")))
  }

  test("funnelStream: documented limit — refinement does not replay a prior rejection") {
    // batch truth over these events: view@40, click@45 (late), so
    // purchase@47 qualifies (funnelCounts would count it). The stream
    // saw purchase@47 in a batch where the click gate was still 50 and
    // rejected it; the later click@45 lowers the gate but cannot replay
    // the dropped purchase — the scaladoc's stated under-count case.
    val in = MemoryStream[Event](spark)
    val q = StreamingEvents.funnelStream(in.toDS(),
        Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_limit")
      .outputMode("append").start()
    in.addData(Event(1, ts(40), 9, "view", 0.0),
      Event(2, ts(50), 9, "click", 0.0))
    q.processAllAvailable()
    in.addData(Event(3, ts(47), 9, "purchase", 0.0)) // gate still 50 → drop
    q.processAllAvailable()
    in.addData(Event(4, ts(45), 9, "click", 0.0)) // refines gate to 45
    q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel_limit")
      .as[(Long, Int, String)].collect().toSet
    assert(got === Set((9L, 1, "view"), (9L, 2, "click"))) // no purchase
    // the same events as ONE batch (or via funnelCounts) DO count it —
    // the reconciliation path the scaladoc prescribes
    val batch = graft.operators.EventQueries.funnelCounts(
      Seq((9L, "view", 40L), (9L, "click", 50L), (9L, "purchase", 47L),
        (9L, "click", 45L)).toDF("user_id", "event_type", "ms"),
      Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(batch(3) === 1L)
  }

  test("dedupStream: duplicate event ids within watermark dropped") {
    val in = MemoryStream[Event](spark)
    val q = StreamingEvents.dedupStream(in.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    in.addData(
      Event(1, ts(0), 1, "a", 1.0),
      Event(1, ts(1), 1, "a", 1.0), // dup id
      Event(2, ts(2), 1, "a", 1.0))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup").count() === 2)
  }

  test("rateAnomalyStream: spike fires after baseline arms, steady hours do not") {
    val in = MemoryStream[Event](spark)
    val q = StreamingEvents.rateAnomalyStream(in.toDS(),
        minBaselineHours = 5)
      .writeStream.format("memory").queryName("rate_anom")
      .outputMode("append").start()
    var id = 0L
    def hourOf(h: Int, n: Int): Seq[Event] =
      (0 until n).map { i =>
        id += 1; Event(id, ts(h * 60 + i), 1, "click", 1.0)
      }
    // hours 0..5: steady 10 events/hour — builds the baseline; each
    // hour closes when the next one starts. Hour 5 closes with a
    // 5-hour armed baseline of constant 10s (variance 0) and c = 10:
    // d = 0, no fire.
    in.addData((0 to 5).flatMap(h => hourOf(h, 10)): _*)
    q.processAllAvailable()
    assert(spark.table("rate_anom").count() === 0)
    // hour 6 is a 60-event spike; hour 7 opens and closes it
    in.addData(hourOf(6, 60): _*)
    in.addData(hourOf(7, 10): _*)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("rate_anom")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out === Set(("click", 6L * 3600000L, 60L, 6L)))
  }

  test("transitionsStream: in-order stream aggregates to the batch matrix") {
    import graft.streaming.Transition
    val in = MemoryStream[Event](spark)
    val q = StreamingEvents.transitionsStream(in.toDS())
      .writeStream.format("memory").queryName("trans")
      .outputMode("append").start()
    // batch 1: u1 view→click; u2 view
    in.addData(Event(1, ts(10), 1, "view", 0.0),
      Event(2, ts(20), 1, "click", 0.0),
      Event(3, ts(15), 2, "view", 0.0))
    q.processAllAvailable()
    // batch 2: u1 click→purchase (cross-batch transition from held
    // state); u2 view→view; u1's LATE event behind the frontier drops
    in.addData(Event(4, ts(30), 1, "purchase", 0.0),
      Event(5, ts(25), 2, "view", 0.0),
      Event(6, ts(5), 1, "view", 0.0)) // behind u1's frontier → dropped
    q.processAllAvailable()
    q.stop()
    val got = spark.table("trans").as[Transition].collect()
      .groupBy(t => (t.prev_type, t.next_type))
      .view.mapValues(_.length).toMap
    assert(got === Map(("view", "click") -> 1, ("click", "purchase") -> 1,
      ("view", "view") -> 1))
  }

  test("attributionStream: purchases split cents across windowed touches " +
    "by the exact batch rule (remainder to earliest, eviction honored)") {
    import graft.streaming.AttrCredit
    val in = MemoryStream[Event](spark)
    // 30-minute window so eviction is testable at minute granularity
    val q = StreamingEvents.attributionStream(in.toDS(),
        windowMs = 30L * 60000)
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    // batch 1: u1 accrues two touches; u2 one touch that will AGE OUT
    in.addData(Event(1, ts(10), 1, "view", 0.0),
      Event(2, ts(20), 1, "click", 0.0),
      Event(3, ts(5), 2, "view", 0.0))
    q.processAllAvailable()
    // batch 2 (cross-batch state): u1 purchase 1.01 → 101 cents over 2
    // touches = 50 each, remainder cent to the EARLIEST (event 1);
    // u2 purchase at minute 40 — its only touch is 35 min old, outside
    // the 30-min window → NO credit rows (batch inner-join semantics)
    in.addData(Event(4, ts(30), 1, "purchase", 1.01),
      Event(5, ts(40), 2, "purchase", 9.99))
    q.processAllAvailable()
    // batch 3: u1's second purchase still sees both touches (25/20 min
    // old) — state survived the first purchase; 0.05 → 5 cents: 2 each
    // + remainder to event 1 → 3/2
    in.addData(Event(6, ts(35), 1, "purchase", 0.05))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attr").as[AttrCredit].collect().toSet
    assert(got === Set(
      AttrCredit(1, 4, 1, "view", 51L), AttrCredit(1, 4, 2, "click", 50L),
      AttrCredit(1, 6, 1, "view", 3L), AttrCredit(1, 6, 2, "click", 2L)))
    // conservation: every purchase's credits sum exactly to its cents
    val byPurchase = got.groupBy(_.p_id).view.mapValues(_.map(_.credit).sum)
    assert(byPurchase.toMap === Map(4L -> 101L, 6L -> 5L))
  }

  test("skylineStream: incremental frontier converges to the batch skyline") {
    import graft.streaming.{SkyFrontier, SkyPoint}
    val in = MemoryStream[SkyPoint](spark)
    val q = StreamingEvents.skylineStream(in.toDS())
      .writeStream.format("memory").queryName("sky")
      .outputMode("append").start()
    // batch 1: (5,5) admitted, then (3,9) and (9,3) join it (mutually
    // non-dominated), (2,2) rejected (dominated by everything)
    in.addData(SkyPoint("en", 5, 5), SkyPoint("en", 3, 9),
      SkyPoint("en", 9, 3), SkyPoint("en", 2, 2),
      SkyPoint("de", 1, 1))
    q.processAllAvailable()
    // batch 2: (6,6) evicts (5,5); (3,9) duplicate ignored; de gets a
    // dominating point evicting (1,1)
    in.addData(SkyPoint("en", 6, 6), SkyPoint("en", 3, 9),
      SkyPoint("de", 4, 4))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("sky").as[SkyFrontier].collect()
    val latest = all.groupBy(_.group).flatMap { case (_, rows) =>
      val maxRev = rows.map(_.rev).max
      rows.filter(_.rev == maxRev).toSeq
    }.map(f => (f.group, f.x, f.y)).toSet
    assert(latest === Set(("en", 3L, 9L), ("en", 6L, 6L), ("en", 9L, 3L),
      ("de", 4L, 4L)))
    // and the streaming answer ≡ the batch operator over all points
    val pts = Seq(("en", 5L, 5L), ("en", 3L, 9L), ("en", 9L, 3L),
      ("en", 2L, 2L), ("de", 1L, 1L), ("en", 6L, 6L), ("de", 4L, 4L))
      .toDF("group", "x", "y")
    val batch = graft.operators.Curation
      .skyline(pts, Seq("group"), "x", "y", "n")
      .select("group", "x", "y")
      .as[(String, Long, Long)].collect().toSet
    assert(latest === batch)
  }

  test("quantileStream: replayed prefix reproduces the batch histogram") {
    import graft.streaming.QuantRow
    val in = MemoryStream[StreamingEvents.Event](spark)
    val q = StreamingEvents.quantileStream(in.toDS())
      .writeStream.format("memory").queryName("quant")
      .outputMode("append").start()
    def ev(id: Long, t: String, v: Double) = StreamingEvents.Event(
      id, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, t, v)
    in.addData(ev(1, "view", 3.2), ev(2, "view", 7.9),
      ev(3, "click", 12.0))
    q.processAllAvailable()
    in.addData(ev(4, "view", 8.5), ev(5, "view", 23.0),
      ev(6, "click", 12.4))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("quant").as[QuantRow].collect()
    val latest = all.groupBy(_.event_type).toSeq.flatMap {
      case (_, rows) =>
        val maxRev = rows.map(_.rev).max
        rows.filter(_.rev == maxRev).toSeq
    }.map(r => (r.event_type, r.bin, r.c)).toSet
    // batch twin over the same six events: bin = floor(v) div 5
    assert(latest === Set(
      ("view", 0L, 1L),   // 3.2 → bin 0
      ("view", 1L, 2L),   // 7.9 and 8.5 → bin 1
      ("view", 4L, 1L),   // 23.0 → bin 4
      ("click", 2L, 2L))) // 12.0 and 12.4 → bin 2
  }

  test("heavyHittersStream: exact regime replays to the batch sketch") {
    import graft.streaming.FreqRow
    val in = MemoryStream[StreamingEvents.Event](spark)
    val q = StreamingEvents.heavyHittersStream(in.toDS(),
        capacity = 16, shards = 4)
      .writeStream.format("memory").queryName("hh")
      .outputMode("append").start()
    def ev(id: Long, t: String) = StreamingEvents.Event(
      id, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, t, 0.0)
    in.addData(ev(1, "view"), ev(2, "view"), ev(3, "click"),
      ev(4, "view"))
    q.processAllAvailable()
    in.addData(ev(5, "click"), ev(6, "purchase"), ev(7, "view"))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("hh").as[FreqRow].collect()
    // compacted-changelog read: max-rev rows per shard, shards unioned
    val latest = all.groupBy(_.shard).toSeq.flatMap { case (_, rows) =>
      val maxRev = rows.map(_.rev).max
      rows.filter(_.rev == maxRev).toSeq
    }
    val sketches = latest.groupBy(_.shard).map { case (_, rows) =>
      Tuple1(rows.sortBy(r => (-r.c, r.t)).map(r => (r.t, r.c)))
    }.toSeq.toDF("sketch")
      .selectExpr("transform(sketch, e -> struct(e._1 AS t, e._2 AS c)) AS sketch")
    val merged = graft.operators.Sketches.mergedFreq(sketches, 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === Map("view" -> 4L, "click" -> 2L, "purchase" -> 1L))
  }

  test("enrichStream: facts with no dim row pass through null-padded") {
    val dim = Seq((1L, "gold"), (3L, "silver")).toDF("user_id", "tier")
    val in = MemoryStream[Event](spark)
    val q = StreamingEvents.enrichStream(in.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    in.addData(
      Event(1, ts(0), 1, "click", 1.0),  // dim hit
      Event(2, ts(1), 2, "view", 2.0),   // NO dim row — must survive
      Event(3, ts(2), 3, "click", 3.0))  // dim hit
    q.processAllAvailable()
    q.stop()
    val out = spark.table("enriched")
      .select(col("event_id"), col("tier"))
      .as[(Long, Option[String])].collect().toSet
    // the unmatched fact is present with a null tier — dropping it
    // (inner-join enrichment) is the bug this operator exists to avoid
    assert(out === Set((1L, Some("gold")), (2L, None),
      (3L, Some("silver"))))
  }
}
