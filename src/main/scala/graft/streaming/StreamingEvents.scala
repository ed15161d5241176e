package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user session accumulator for [[StreamingEvents.statefulSessionize]].
  * Top-level and public: Spark's state encoder generates Janino code that
  * must instantiate and read this class reflectively — a private nested
  * case class fails codegen (`No applicable constructor/method found`).
  */
final case class SessionState(startMs: Long, lastMs: Long, n: Long)

/** Per-user funnel progress for [[StreamingEvents.funnelStream]]:
  * `gates(k)` = first qualifying event-time of completed step k. Fixed
  * width (≤ number of funnel steps), so state is O(users·steps) longs —
  * the same growth class as any per-user streaming aggregate. Top-level
  * and public for the state encoder (see [[SessionState]]).
  */
final case class FunnelState(gates: Seq[Long])

/** One funnel advancement fact: `user_id` first completed `step`
  * (1-based) at some event within the stream.
  */
final case class FunnelAdvance(user_id: Long, step: Int, step_name: String)

/** Per-type running state for [[StreamingEvents.rateAnomalyStream]]:
  * the OPEN hour (`hourStart`, `c`) plus the closed-hour baseline in
  * mergeable (n, s, q) moment form — five longs per key, constant
  * width forever. Top-level and public for the state encoder (see
  * [[SessionState]]). `hourStart = -1` ⇔ no hour is open.
  */
final case class RateState(hourStart: Long, c: Long,
                           n: Long, s: Long, q: Long)

/** One rate anomaly: `event_type`'s traffic in the hour starting at
  * `hour_start_ms` was `c` events against a `n_baseline`-hour history
  * whose mean it exceeds by more than 2σ.
  */
final case class RateAnomaly(event_type: String, hour_start_ms: Long,
                             c: Long, n_baseline: Long)

/** One candidate point for [[StreamingEvents.skylineStream]]: a group
  * key (e.g. language) and the two axes being maximized. Top-level and
  * public for the state encoder (see [[SessionState]]).
  */
final case class SkyPoint(group: String, x: Long, y: Long)

/** Per-group incremental-skyline state: `rev` counts the batches this
  * group has folded; `xy` is the current frontier as interleaved
  * (x, y) pairs sorted by x — bounded by |distinct x values on the
  * frontier|, NOT by points seen. Top-level and public for the state
  * encoder.
  */
final case class SkyState(rev: Long, xy: Seq[Long])

/** One frontier point of `group`'s skyline as of batch `rev`. The
  * frontier at the group's max rev is the current answer.
  */
final case class SkyFrontier(group: String, rev: Long, x: Long, y: Long)

/** Per-user last-event frontier for
  * [[StreamingEvents.transitionsStream]] — three fields, constant
  * width forever. Top-level and public for the state encoder (see
  * [[SessionState]]).
  */
final case class TransState(lastMs: Long, lastId: Long, lastType: String)

/** One consecutive-event transition fact for `user_id`. Downstream,
  * `groupBy(prev_type, next_type).count()` is the live Markov matrix —
  * the streaming twin of q_event_transitions.
  */
final case class Transition(user_id: Long, prev_type: String,
                            next_type: String)

/** Per-shard Misra–Gries counter state for
  * [[StreamingEvents.heavyHittersStream]] — parallel key/count seqs
  * (≤ capacity entries) plus the emission revision. Top-level and
  * public for the state encoder (see [[SessionState]]).
  */
final case class FreqState(rev: Long, keys: Seq[String],
                           counts: Seq[Long])

/** One heavy-hitter counter row from shard `shard` at revision `rev`;
  * consumers keep each shard's max-rev rows and union shards via
  * [[graft.operators.Sketches.mergedFreq]] (the compacted-changelog
  * convention [[SkyFrontier]] uses).
  */
final case class FreqRow(shard: Int, rev: Long, t: String, c: Long)

/** Per-type running value-histogram state for
  * [[StreamingEvents.quantileStream]]: parallel bin/count seqs plus
  * the emission revision. Bins are data-independent (value div 5, the
  * SAME grid as batch q_mergeable_quantiles), so states merge by
  * addition and the seq stays bounded by the value range. Top-level
  * and public for the state encoder (see [[SessionState]]).
  */
final case class QuantState(rev: Long, bins: Seq[Long],
                            counts: Seq[Long])

/** One histogram-bin row from `event_type` at revision `rev`;
  * consumers keep max-rev rows per type — the merged counts give
  * exact-to-bin-width quantiles, identically to the batch query.
  */
final case class QuantRow(event_type: String, rev: Long, bin: Long,
                          c: Long)

/** Pending-touch window state for
  * [[StreamingEvents.attributionStream]]: the processed-event frontier
  * plus parallel (t_ms, t_id, touch_type) seqs — bounded by per-user
  * activity inside ONE attribution window, the same bound as the batch
  * pair volume. Top-level and public for the state encoder (see
  * [[SessionState]]).
  */
final case class AttrState(frontMs: Long, tMs: Seq[Long],
                           tId: Seq[Long], tType: Seq[String])

/** One attribution credit fact: purchase `p_id` paid `credit` cents to
  * touch `t_id` of channel `touch_type`. A purchase's credits sum
  * EXACTLY to its half-cent-rounded value (integer split, remainder to
  * the earliest touch) — the same rule as batch q_attribution_linear.
  */
final case class AttrCredit(user_id: Long, p_id: Long, t_id: Long,
                            touch_type: String, credit: Long)

/** First-seen state for [[StreamingEvents.newVsReturningStream]]: the
  * user's first-seen epoch day plus the last emitted day (the per-user
  * frontier). Top-level and public for the state encoder.
  */
final case class FirstSeenState(firstDay: Long, lastDay: Long)

/** One per-(user, day) activity fact with its acquisition verdict. */
final case class DayActivity(user_id: Long, day: Long, is_new: Boolean)

/** Event-stream operators: watermarked tumbling-window aggregation,
  * gap-based session windows, and custom per-key state via
  * `flatMapGroupsWithState` — the streaming counterparts of
  * EventQueries' batch sessionization.
  *
  * Late/duplicate handling in the reference is dedup-on-merge only
  * (SURVEY.md §2.7); here watermarks bound state so the operators run
  * unbounded. All transforms work identically on batch DataFrames
  * (Spark's unified model), which is how the specs pin their semantics.
  */
object StreamingEvents {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class SessionOut(user_id: Long, session_start_ms: Long,
                              session_end_ms: Long, n_events: Long)

  /** Tumbling 1-hour counts per event type; 2-hour watermark bounds
    * state. Append mode emits a window only once it is final.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Gap-based sessions via the built-in session_window (30-minute gap).
    * The state Spark keeps is one open window per (user, session).
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes")
      : DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"), col("session_window.start").as("start"),
        col("session_window.end").as("end"), col("n_events"),
        col("total_value"))

  /** Custom-state sessionization: flatMapGroupsWithState with an event-
    * time timeout. Emits a session when the gap elapses past the
    * watermark. The state per user is three longs — constant-size
    * regardless of session length, the 100-TB-safe shape.
    */
  def statefulSessionize(events: Dataset[Event],
                         gapMs: Long = 30L * 60 * 1000)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.startMs, s.lastMs, s.n))
          } else {
            // fold this micro-batch's events (sorted: micro-batches are
            // small per key; the sort is in-executor, not a shuffle)
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var st = state.getOption.orNull
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              st match {
                case null =>
                  st = SessionState(t, t, 1)
                case s if t - s.lastMs > gapMs =>
                  closed += SessionOut(user, s.startMs, s.lastMs, s.n)
                  st = SessionState(t, t, 1)
                case s =>
                  st = SessionState(s.startMs, math.max(s.lastMs, t), s.n + 1)
              }
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(st.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming rate-anomaly detection — the incremental twin of
    * [[graft.operators.EventQueries]]' q_rate_anomaly: per event_type,
    * maintain the closed-hour count history as mergeable integer
    * moments (n, s, q) and test each hour AS IT CLOSES with the same
    * division-free z² > 4 rule the batch query uses. An hour closes
    * when a later hour's event arrives for that key, or when the
    * watermark passes its end (event-time timeout) — so a spike is
    * flagged one hour-boundary after it happens, not at end-of-day.
    *
    * Semantics vs batch: the baseline is PRIOR closed hours only (a
    * prefix test — the batch query tests against the full-window
    * stats), anomalies need `minBaselineHours` of history before the
    * detector arms, and late events for already-closed hours are
    * dropped (they refine nothing; the batch query is the
    * reconciliation path). State per key is five longs — constant
    * width at any stream length, the 100-TB-safe shape.
    */
  def rateAnomalyStream(events: Dataset[Event],
                        minBaselineHours: Int = 5)
      : Dataset[RateAnomaly] = {
    import events.sparkSession.implicits._
    val HOUR = 3600000L
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[RateState, RateAnomaly](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (etype: String, rows: Iterator[Event],
         state: GroupState[RateState]) =>
          // close the open hour: maybe-fire the z² test against the
          // PRIOR baseline, then fold the hour into (n, s, q)
          def close(st: RateState): (Option[RateAnomaly], RateState) = {
            val d = st.c * st.n - st.s
            val fire = st.n >= minBaselineHours &&
              d * d > 4 * (st.n * st.q - st.s * st.s)
            val out =
              if (fire) Some(RateAnomaly(etype, st.hourStart, st.c, st.n))
              else None
            (out, RateState(-1L, 0L,
              st.n + 1, st.s + st.c, st.q + st.c * st.c))
          }
          if (state.hasTimedOut) {
            val st = state.get
            if (st.hourStart < 0) Iterator.empty
            else {
              val (out, next) = close(st)
              state.update(next)
              out.iterator
            }
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var st = state.getOption
              .getOrElse(RateState(-1L, 0L, 0L, 0L, 0L))
            val outs = Seq.newBuilder[RateAnomaly]
            sorted.foreach { e =>
              val h = (e.ts.getTime / HOUR) * HOUR
              if (st.hourStart < 0)
                st = st.copy(hourStart = h, c = 1L)
              else if (h == st.hourStart)
                st = st.copy(c = st.c + 1)
              else if (h > st.hourStart) {
                val (out, next) = close(st)
                out.foreach(outs += _)
                st = next.copy(hourStart = h, c = 1L)
              }
              // h < hourStart: late event for a closed hour — dropped
            }
            state.update(st)
            if (st.hourStart >= 0)
              state.setTimeoutTimestamp(st.hourStart + HOUR)
            outs.result().iterator
          }
      }
  }

  /** Streaming ordered funnel — the incremental twin of
    * [[graft.operators.EventQueries.funnelCounts]]: emits one
    * [[FunnelAdvance]] fact the first time a user completes each step,
    * where step k only qualifies at event-time ≥ step k−1's gate.
    *
    * Late data (within the watermark) is handled by GATE REFINEMENT: a
    * late event of an already-completed step that qualifies EARLIER
    * (≥ the previous gate, < the recorded one) lowers that gate — the
    * GATES converge to the batch gates, and steps validated against the
    * old, higher gate stay valid against the lower one a fortiori.
    * Advancements already emitted are facts (step completion is
    * monotone) and never retract.
    *
    * Precise guarantee (weaker than full batch equivalence): each
    * advancement decision is made AT ARRIVAL against the then-current
    * gates. A next-step event rejected in an earlier micro-batch is NOT
    * replayed when a later late event lowers its gate — that would
    * require buffering every non-qualifying event, the trade streaming
    * makes everywhere. So the stream can UNDER-count a step whose
    * qualifying event arrived before the refinement that would have
    * admitted it (StreamingSpec pins this case); on in-order streams,
    * and on any batch Dataset (unified model — PropertySpec), output
    * equals [[graft.operators.EventQueries.funnelCounts]] exactly. The
    * batch operator is the reconciliation path.
    *
    * State per user is a ≤`steps.length`-long vector — constant width,
    * same scale class as any per-user running aggregate.
    */
  def funnelStream(events: Dataset[Event],
                   steps: Seq[String]): Dataset[FunnelAdvance] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelAdvance](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Event],
         state: GroupState[FunnelState]) =>
          // same-ms ties process in STEP order (view before click before
          // purchase): batch gates are `ms >= gate`, so a same-ms
          // next-step event qualifies — the gate must be set first or
          // the fold diverges from funnelCounts on tied timestamps
          // (caught by PropertySpec's random-data equivalence)
          val sorted = rows.toSeq.sortBy(e =>
            (e.ts.getTime, steps.indexOf(e.event_type), e.event_id))
          var gates = state.getOption
            .map(_.gates.toVector).getOrElse(Vector.empty[Long])
          val out = Seq.newBuilder[FunnelAdvance]
          sorted.foreach { e =>
            val k = steps.indexOf(e.event_type)
            if (k >= 0) {
              val t = e.ts.getTime
              val gateOk =
                k == 0 || (k - 1 < gates.length && t >= gates(k - 1))
              if (k == gates.length && gateOk) {
                gates = gates :+ t
                out += FunnelAdvance(user, k + 1, steps(k))
              } else if (k < gates.length && gateOk && t < gates(k)) {
                gates = gates.updated(k, t) // late lower-gate refinement
              }
            }
          }
          if (gates.nonEmpty) state.update(FunnelState(gates))
          out.result().iterator
      }
  }

  /** Incremental Markov transitions — the streaming twin of
    * q_event_transitions: per user, emit one (prev → next) fact per
    * consecutive event pair, carrying only the LAST event per user as
    * state (three fields — the minimum any cross-batch sequence
    * operator can hold). Within a batch events sort by (ts, event_id);
    * an event older than the consumed frontier is dropped rather than
    * spliced (splicing would retro-invalidate an already-emitted
    * transition — the same no-replay convention as rateAnomalyStream's
    * closed hours and funnelStream's rejections). On an in-order
    * stream the emitted facts aggregate to exactly the batch matrix;
    * the spec pins both the equivalence and the documented drop.
    */
  def transitionsStream(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event],
         state: GroupState[TransState]) =>
          val sorted = rows.toSeq
            .sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.orNull
          val out = Seq.newBuilder[Transition]
          sorted.foreach { e =>
            val ms = e.ts.getTime
            if (st == null)
              st = TransState(ms, e.event_id, e.event_type)
            else if (ms > st.lastMs ||
              (ms == st.lastMs && e.event_id > st.lastId)) {
              out += Transition(uid, st.lastType, e.event_type)
              st = TransState(ms, e.event_id, e.event_type)
            }
            // else: behind the frontier — dropped, see scaladoc
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** Incremental Pareto skyline — the streaming twin of
    * [[graft.operators.Curation.skyline]]: per group, maintain the set
    * of points not dominated by any other seen so far (maximize both
    * axes), folding each micro-batch into bounded per-group state. A
    * new point is admitted iff no frontier point weakly dominates it;
    * admission evicts every frontier point it strictly dominates — so
    * state is exactly the current frontier (≤ |distinct x| pairs),
    * never the points seen, and a batch's work is
    * O(batch · frontier). Each batch the group touches emits its full
    * updated frontier stamped with a revision; the max-rev rows are
    * the current answer (append mode cannot retract, so consumers
    * read the latest revision — the same convention a compacted
    * changelog topic uses).
    *
    * No watermark/timeout: the frontier is monotone (a point once
    * dominated can never return), so state needs no expiry to stay
    * bounded.
    */
  def skylineStream(points: Dataset[SkyPoint]): Dataset[SkyFrontier] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.group)
      .flatMapGroupsWithState[SkyState, SkyFrontier](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[SkyPoint],
         state: GroupState[SkyState]) =>
          var front = state.getOption
            .map(_.xy.grouped(2).map(p => (p(0), p(1))).toVector)
            .getOrElse(Vector.empty[(Long, Long)])
          rows.foreach { p =>
            val pt = (p.x, p.y)
            val dominated = front.exists { case (fx, fy) =>
              fx >= p.x && fy >= p.y && (fx > p.x || fy > p.y)
            }
            if (!dominated && !front.contains(pt))
              front = front.filterNot { case (fx, fy) =>
                p.x >= fx && p.y >= fy && (p.x > fx || p.y > fy)
              } :+ pt
          }
          val rev = state.getOption.map(_.rev + 1).getOrElse(1L)
          val sorted = front.sorted
          state.update(SkyState(rev,
            sorted.flatMap { case (x, y) => Seq(x, y) }))
          sorted.iterator.map { case (x, y) => SkyFrontier(g, rev, x, y) }
      }
  }

  /** Incremental heavy hitters — the streaming twin of q_heavy_hitters:
    * per SHARD (deterministic hash of the key, so hot keys cannot
    * funnel one task and state splits `shards` ways), fold each
    * micro-batch's arrivals into a ≤ capacity Misra–Gries counter map
    * using the EXACT update rule of the `freq_sketch` aggregate
    * ([[graft.plans.MisraGries]] is shared code, so the two cannot
    * drift). Each batch the shard touches emits its full updated
    * counter set stamped with a revision; consumers keep max-rev rows
    * per shard and union shards with
    * [[graft.operators.Sketches.mergedFreq]] — the same PODS'12 merge
    * the batch side uses for persisted sketches.
    *
    * State is ≤ capacity (string, long) pairs per shard — constant
    * width forever, no watermark needed. In the exact regime (distinct
    * keys ≤ capacity per shard) replaying any prefix of the stream
    * reproduces the batch sketch of that prefix bit-for-bit
    * (spec-pinned); under capacity pressure the MG lower-bound
    * guarantees hold per shard and survive the merge.
    */
  def heavyHittersStream(events: Dataset[Event], capacity: Int = 64,
                         shards: Int = 8): Dataset[FreqRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(e =>
        math.floorMod(e.event_type.hashCode, shards))
      .flatMapGroupsWithState[FreqState, FreqRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[Event],
         state: GroupState[FreqState]) =>
          val m = scala.collection.mutable.HashMap
            .empty[String, Long]
          val prev = state.getOption
          prev.foreach(st => st.keys.zip(st.counts).foreach {
            case (k, c) => m.update(k, c)
          })
          rows.foreach(e =>
            graft.plans.MisraGries.update(m, e.event_type, capacity))
          val rev = prev.map(_.rev + 1).getOrElse(1L)
          val sorted = m.toSeq.sortBy { case (k, c) => (-c, k) }
          state.update(FreqState(rev, sorted.map(_._1),
            sorted.map(_._2)))
          sorted.iterator.map { case (k, c) => FreqRow(shard, rev, k, c) }
      }
  }

  /** Incremental quantile histograms — the streaming twin of
    * q_mergeable_quantiles: per event type, fold each micro-batch's
    * values into the SAME data-independent fixed bins the batch query
    * uses (value div 5), keep the running counts as state, and emit
    * the full updated histogram revision-stamped (compacted-changelog
    * convention, as [[skylineStream]]). Consumers take max-rev rows
    * per type; p50/p95 fall out of a cumulative walk over the ≤
    * |value range / 5| bins — exact to bin width, and because bins
    * merge by ADDITION a replayed prefix reproduces the batch
    * histogram of that prefix bit-for-bit (spec-pinned).
    *
    * State is the per-type bin map — bounded by the value range, not
    * the stream; no watermark needed.
    */
  def quantileStream(events: Dataset[Event]): Dataset[QuantRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[QuantState, QuantRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, rows: Iterator[Event],
         state: GroupState[QuantState]) =>
          val m = scala.collection.mutable.HashMap.empty[Long, Long]
          val prev = state.getOption
          prev.foreach(st => st.bins.zip(st.counts).foreach {
            case (b, c) => m.update(b, c)
          })
          rows.foreach { e =>
            val bin = math.floor(e.value).toLong / 5
            m.update(bin, m.getOrElse(bin, 0L) + 1L)
          }
          val rev = prev.map(_.rev + 1).getOrElse(1L)
          val sorted = m.toSeq.sortBy(_._1)
          state.update(QuantState(rev, sorted.map(_._1),
            sorted.map(_._2)))
          sorted.iterator.map { case (b, c) => QuantRow(tpe, rev, b, c) }
      }
  }

  /** Streaming dedup on event_id with a watermark bounding the id cache —
    * the streaming twin of the batch merge's dedup-on-key.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming twin of batch q_new_vs_returning's per-user core:
    * identity resolution with the MINIMAL keyed state every growth
    * pipeline keeps — the user's first-seen day plus the last emitted
    * day (two longs, constant regardless of history). Each micro-batch
    * emits the user's not-yet-seen activity days tagged new (first
    * ever) or returning; the batch daily rollup (n_active/n_new per
    * day) is a plain groupBy over this stream's output, which is how
    * the spec pins equivalence against the batch query on the real
    * events parquet. Days at-or-behind the emitted frontier are
    * DROPPED — the same in-order-per-user contract as
    * [[transitionsStream]] (a late earlier-day arrival cannot retract
    * an already-emitted "new" verdict in append mode).
    */
  def newVsReturningStream(events: Dataset[Event])
      : Dataset[DayActivity] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FirstSeenState, DayActivity](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event],
         state: GroupState[FirstSeenState]) =>
          val days = rows.map(e => e.ts.getTime / 86400000L)
            .toSeq.distinct.sorted
          var st = state.getOption.orNull
          val out = Seq.newBuilder[DayActivity]
          days.foreach { d =>
            if (st == null) {
              out += DayActivity(uid, d, is_new = true)
              st = FirstSeenState(d, d)
            } else if (d > st.lastDay) {
              out += DayActivity(uid, d, is_new = false)
              st = st.copy(lastDay = d)
            }
            // else: at/behind the frontier — dropped, see scaladoc
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** Stream-static enrichment: each streaming event picks up its
    * dimension row (segment, tier, account metadata) by equi-joining
    * the BATCH `dim` frame — the standard "enrich the fact stream"
    * pattern. The static side is planned fresh per micro-batch (and
    * broadcast, so no stream-side shuffle and NO stream state at
    * all), which means a dim table updated between batches is picked
    * up automatically — the property preloading dims into keyed state
    * loses. LEFT join by contract: an event with no dim row passes
    * through null-padded instead of silently dropping a fact whose
    * dimension arrived late (the classic enrichment bug; the nulls
    * are the signal a backfill pass reconciles).
    *
    * 100 TB posture: dims that outgrow broadcast fall back to the
    * same call without the hint (per-batch shuffle join), or to the
    * state-backed stream-stream join ([[attributionJoin]]) when the
    * dim itself is a changelog.
    */
  def enrichStream(events: DataFrame, dim: DataFrame,
                   key: String): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(dim), Seq(key),
      "left_outer")

  /** Stream-stream inner join: match each `action` event to the same
    * user's `trigger` event within `withinMs` AFTER the trigger — e.g.
    * click-to-conversion attribution. Both sides carry watermarks and
    * the join condition bounds the time skew, so Spark can size the join
    * state buffers and EVICT rows once the watermark passes — the two
    * requirements that make an unbounded stream-stream join runnable
    * (an unconstrained one would buffer both streams forever).
    */
  /** Streaming LINEAR multi-touch attribution — the stateful twin of
    * batch q_attribution_linear. Per user, the state is the click/view
    * touches inside the trailing `windowMs`; each purchase emits its
    * credit split AT THE PURCHASE: cents div nt per touch, the integer
    * remainder to the earliest (t_ms, t_id) touch, so per-purchase
    * credit sums exactly to the half-cent-rounded value. On an
    * in-order stream the emitted facts aggregate to exactly the batch
    * query's channel totals; behind-frontier events drop by the
    * [[transitionsStream]] convention (the batch query is the
    * reconciliation path, as with [[rateAnomalyStream]]).
    *
    * 100 TB posture: state per user = frontier + touches inside ONE
    * window (the batch pair-volume bound), pruned on every event and
    * evicted by event-time timeout once a user goes idle past the
    * window; purchases never buffer.
    */
  def attributionStream(events: Dataset[Event],
                        windowMs: Long = 7L * 24 * 3600 * 1000)
      : Dataset[AttrCredit] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, AttrCredit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event],
         state: GroupState[AttrState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq
              .sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption
              .getOrElse(AttrState(Long.MinValue, Nil, Nil, Nil))
            val out = Seq.newBuilder[AttrCredit]
            sorted.foreach { e =>
              val ms = e.ts.getTime
              val relevant = e.event_type == "click" ||
                e.event_type == "view" || e.event_type == "purchase"
              if (relevant && ms >= st.frontMs) {
                // prune touches that fell out of the window
                val keep = st.tMs.indices
                  .filter(i => ms - st.tMs(i) <= windowMs)
                var tMs = keep.map(st.tMs)
                var tId = keep.map(st.tId)
                var tType = keep.map(st.tType)
                if (e.event_type == "purchase") {
                  val nt = tMs.size
                  if (nt > 0) {
                    val cents = math.floor(e.value * 100 + 0.5).toLong
                    val base = cents / nt
                    val rem = cents % nt
                    val first = tMs.indices
                      .minBy(i => (tMs(i), tId(i)))
                    tMs.indices.foreach { i =>
                      out += AttrCredit(user, e.event_id, tId(i),
                        tType(i),
                        base + (if (i == first) rem else 0L))
                    }
                  }
                } else {
                  tMs :+= ms; tId :+= e.event_id; tType :+= e.event_type
                }
                st = AttrState(ms, tMs, tId, tType)
              }
            }
            if (st.frontMs != Long.MinValue) {
              state.update(st)
              // the eviction alarm must sit ABOVE the current watermark
              // (Spark rejects a timeout the clock already passed — a
              // user whose whole batch was behind-frontier drops would
              // hit that with a bare frontMs + windowMs)
              state.setTimeoutTimestamp(math.max(st.frontMs + windowMs,
                state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  def attributionJoin(triggers: DataFrame, actions: DataFrame,
                      withinMs: Long = 30L * 60 * 1000): DataFrame = {
    // rename FIRST, then watermark the renamed column: withWatermark
    // tags the attribute it is given, and a later alias produces a new
    // attribute without the event-time tag
    val t = triggers
      .select(col("user_id"), col("event_id").as("trigger_id"),
        col("ts").as("trigger_ts"))
      .withWatermark("trigger_ts", "2 hours")
    val a = actions
      .select(col("user_id").as("a_user_id"),
        col("event_id").as("action_id"), col("ts").as("action_ts"))
      .withWatermark("action_ts", "2 hours")
    t.join(a,
      col("user_id") === col("a_user_id") &&
        col("action_ts") >= col("trigger_ts") &&
        col("action_ts") <=
          col("trigger_ts") + expr(s"INTERVAL $withinMs MILLISECOND"))
      .select(col("user_id"), col("trigger_id"), col("action_id"),
        col("trigger_ts"), col("action_ts"))
  }

  /** LEFT OUTER stream-stream attribution: like [[attributionJoin]],
    * but triggers that never convert still come out — with null action
    * columns — once the watermark passes the end of their match
    * window, i.e. when the engine can PROVE no action can still
    * arrive. That deferred null-padding is the semantic difference
    * from a batch left join (which answers immediately) and the reason
    * the time bound + both-side watermarks are mandatory here: they
    * are what lets state for old triggers be evicted instead of
    * buffered forever. Downstream this is the conversion-rate input —
    * matched AND unmatched triggers in one stream.
    */
  def attributionJoinLeftOuter(triggers: DataFrame, actions: DataFrame,
                               withinMs: Long = 30L * 60 * 1000)
      : DataFrame = {
    val t = triggers
      .select(col("user_id"), col("event_id").as("trigger_id"),
        col("ts").as("trigger_ts"))
      .withWatermark("trigger_ts", "2 hours")
    val a = actions
      .select(col("user_id").as("a_user_id"),
        col("event_id").as("action_id"), col("ts").as("action_ts"))
      .withWatermark("action_ts", "2 hours")
    t.join(a,
      col("user_id") === col("a_user_id") &&
        col("action_ts") >= col("trigger_ts") &&
        col("action_ts") <=
          col("trigger_ts") + expr(s"INTERVAL $withinMs MILLISECOND"),
      "leftOuter")
      .select(col("user_id"), col("trigger_id"), col("action_id"),
        col("trigger_ts"), col("action_ts"))
  }
}
