package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventQueries

/** Semantics of the event-analytics operators on crafted timelines
  * where the right answer is known by construction (the testdata oracle
  * checks parity; these pin MEANING — especially the funnel's ordering
  * rule, which a naive per-step min would get wrong).
  */
class EventAnalyticsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "ms")

  test("funnelCounts: order matters — a click before any view does not advance") {
    val events = ev(
      // user 1 completes in order: view@10, click@20, purchase@30
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2 clicks BEFORE viewing: click@5, view@10 — funnel stops at view
      (2L, "click", 5L), (2L, "view", 10L),
      // user 3 views then purchases with no click — stops after view
      (3L, "view", 10L), (3L, "purchase", 20L),
      // user 4 never views; click+purchase alone never enter the funnel
      (4L, "click", 10L), (4L, "purchase", 20L),
      // user 5: click at the SAME ms as the first view counts (>=)
      (5L, "view", 10L), (5L, "click", 10L))
    val got = EventQueries.funnelCounts(events,
        Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(got === Map("view" -> 4L, "click" -> 2L, "purchase" -> 1L))
  }

  test("funnelCounts: later cheaper occurrence does not rewrite an earlier gate") {
    // user's first view is at 100; a click at 50 (before) and 150
    // (after): the 150 click advances; purchase must then be >= 150
    val events = ev(
      (1L, "view", 100L), (1L, "click", 50L), (1L, "click", 150L),
      (1L, "purchase", 120L)) // purchase BETWEEN view and valid click
    val got = EventQueries.funnelCounts(events,
        Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(got === Map("view" -> 1L, "click" -> 1L, "purchase" -> 0L))
  }

  test("cohortRetention: offsets count distinct users from their first week") {
    val wk = 7L * 86400000L
    val events = ev(
      // user 1 active weeks 0, 1, 3 (several events in week 0)
      (1L, "view", 0L), (1L, "click", 1000L), (1L, "view", wk),
      (1L, "view", 3 * wk),
      // user 2 first seen week 1, active weeks 1 and 3 (offsets 0, 2)
      (2L, "view", wk), (2L, "view", 3 * wk))
    val got = EventQueries.cohortRetention(events)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L), // user 1's cohort-0 row per week
      (1L, 0L, 1L), (1L, 2L, 1L)))              // user 2's cohort-1 rows
  }

  test("burstiness: metronome gaps → CV² 0; a 1s/99s burst pair → 960400 ppm") {
    val events = Seq(
      // user 1: events every 10 s — three equal gaps, CV² = 0
      (1L, 0L, 1L), (1L, 10000L, 2L), (1L, 20000L, 3L),
      (1L, 30000L, 4L),
      // user 2: gaps 1 s and 99 s — n=2, sg=100, sgg=9802:
      // cv2 = (2*9802 - 10000)*1e6 // 10000 = 960400
      (2L, 0L, 5L), (2L, 1000L, 6L), (2L, 100000L, 7L),
      // user 3: a single gap — dropped by the >= 2 gate
      (3L, 0L, 8L), (3L, 5000L, 9L))
      .toDF("user_id", "ms", "event_id")
    val got = EventQueries.burstiness(events)
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(got === Set(
      (1L, 3L, 10L, Some(0L)),
      (2L, 2L, 50L, Some(960400L))))
  }

  test("markovStationary: a deterministic 2-cycle holds the uniform split") {
    // a→b→a→b…: P is the swap matrix, uniform (500000, 500000) is the
    // exact stationary point — every iteration maps it to itself, so
    // the unrolled integer rounds must preserve it bit-exactly
    val events = Seq(
      (1L, 0L, 1L, "a"), (1L, 1000L, 2L, "b"),
      (1L, 2000L, 3L, "a"), (1L, 3000L, 4L, "b"),
      (1L, 4000L, 5L, "a"))
      .toDF("user_id", "ms", "event_id", "event_type")
    val got = EventQueries.markovStationary(events, 4)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 500000L, "b" -> 500000L))
  }

  test("markovStationary: an absorbing state collects the mass") {
    // a always moves to b, b always stays at b: after 4 rounds almost
    // all of a's initial half has drained into b (truncating integer
    // division sheds nothing here — transitions are deterministic)
    val events = Seq(
      (1L, 0L, 1L, "a"), (1L, 1000L, 2L, "b"), (1L, 2000L, 3L, "b"),
      (1L, 3000L, 4L, "b"))
      .toDF("user_id", "ms", "event_id", "event_type")
    val got = EventQueries.markovStationary(events, 4)
      .as[(String, Long)].collect().toMap
    // only b survives: a receives no mass after round 1 and drops out
    assert(got === Map("b" -> 1000000L))
  }
}
