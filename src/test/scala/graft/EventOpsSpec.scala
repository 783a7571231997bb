package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventOps

/** Semi-structured + quantile operators over events. */
class EventOpsSpec extends AnyFunSuite with SparkFixture {

  test("eventsPropsAgg parses JSON props; empty objects yield NULL k") {
    // fixture props are all "{}" → k extraction yields NULL everywhere:
    // n_with_k = 0, sum/min/max NULL, but every event still counted
    val rows = EventOps.eventsPropsAgg(spark, fixtureDir).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum === 4L)
    assert(rows.forall(_.getAs[Long]("n_with_k") === 0L))
    assert(rows.forall(_.isNullAt(rows.head.fieldIndex("sum_k"))))
  }

  test("sketch rollup: weekly HLL-merged cardinality within 5% of the exact twin") {
    val exact = EventOps.userCardinalityWeekly(spark, fixtureDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val approx = EventOps.userCardinalityRollup(spark, fixtureDir).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2), r.getLong(3)))
    assert(approx.map(x => x._1).toSet === exact.keySet)
    approx.foreach { case (key, nDays, est) =>
      assert(nDays >= 1L)
      val ex = exact(key)
      // lgK=14 HLL rse ~0.8%; tiny fixture counts must be near-exact
      assert(math.abs(est - ex) <= math.max(1L, ex / 20),
        s"$key: sketch $est vs exact $ex")
    }
  }

  test("theta-sketch segment algebra matches the exact twin on planted partial overlap") {
    import spark.implicits._
    val dir = scratchDir("graft-theta")
    // clickers 1..60, buyers 40..100 → both = 21, click-only = 39,
    // buy-only = 40 (the partial overlap the all-overlap testdata
    // never exercises — the difference estimates must be non-zero)
    val rows =
      (1L to 60L).map(u => (u, u * 1000000000L, u, "click", 1.0, "{}")) ++
      (40L to 100L).map(u => (1000L + u, u * 1000000000L, u, "purchase", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val exact = EventOps.userSegmentSetOps(spark, dir).collect()
      .groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
    val theta = EventOps.userSegmentTheta(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(theta.keySet === Set("click_and_buy", "click_no_buy", "buy_no_click"))
    assert(exact === Map("click_and_buy" -> 21L, "click_no_buy" -> 39L,
      "buy_no_click" -> 40L))
    theta.foreach { case (seg, est) =>
      val ex = exact(seg).toDouble
      // lgK=12 theta sketches stay in exact mode below 4096 entries;
      // allow 5% for the general estimation-mode contract anyway
      assert(math.abs(est - ex) <= math.max(1.0, ex * 0.05),
        s"$seg: theta $est vs exact $ex")
    }
  }

  test("per-week theta rollup: weekly segments match per-week exact sets, merged level re-aggregates across weeks") {
    import spark.implicits._
    val dir = scratchDir("graft-theta-weekly")
    val dayNs = 86400L * 1000000000L
    // week 0 (day 1): clickers 1..30, buyers 20..50; week 1 (day 8):
    // clickers 40..70, buyers 60..90. Users 40..50 click in week 1 but
    // buy in week 0 — their overlap exists ONLY at the merged level,
    // so merged ∩ (33) ≠ the sum of weekly ∩s (11 + 11): exactly the
    // re-aggregation exact per-week distincts cannot do and the
    // sketch-union level must.
    def ev(day: Long, users: Range, typ: String, base: Long) =
      users.map(u => (base + u, day * dayNs + u * 1000000L, u.toLong, typ, 1.0, "{}"))
    val rows = ev(1, 1 to 30, "click", 0L) ++ ev(1, 20 to 50, "purchase", 1000L) ++
      ev(8, 40 to 70, "click", 2000L) ++ ev(8, 60 to 90, "purchase", 3000L)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = EventOps.userSegmentThetaWeekly(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val expected = Map(
      (0L, "click_and_buy") -> 11.0, (0L, "click_no_buy") -> 19.0,
      (0L, "buy_no_click") -> 20.0,
      (1L, "click_and_buy") -> 11.0, (1L, "click_no_buy") -> 20.0,
      (1L, "buy_no_click") -> 20.0,
      (-1L, "click_and_buy") -> 33.0, (-1L, "click_no_buy") -> 28.0,
      (-1L, "buy_no_click") -> 29.0)
    assert(got.keySet === expected.keySet)
    expected.foreach { case (key, ex) =>
      // lgK=12 theta sketches stay in exact mode below 4096 entries;
      // allow 5% for the general estimation-mode contract anyway
      assert(math.abs(got(key) - ex) <= math.max(1.0, ex * 0.05),
        s"$key: theta ${got(key)} vs exact $ex")
    }
    // the merged row must NOT equal the sum of weekly readouts (the
    // cross-week users are the point)
    assert(got((-1L, "click_and_buy")) > got((0L, "click_and_buy")) + got((1L, "click_and_buy")) + 5)
  }

  test("event rate anomaly flags the planted spike, drop, and gap days only") {
    import spark.implicits._
    val dir = scratchDir("graft-anomaly")
    val dayNs = 86400L * 1000000000L
    val d0 = Fixtures.RefTs / dayNs // day number of the reference epoch
    // (type, day offset, count): a spikes then drops, b skips a day,
    // c moves 6 -> 7 (inside the [2/3, 3/2) band -> unflagged)
    val planted = Seq(
      ("a", 0, 4), ("a", 1, 6), ("a", 2, 2),
      ("b", 0, 5), ("b", 2, 5),
      ("c", 0, 6), ("c", 1, 7))
    val rows = planted.zipWithIndex.flatMap { case ((t, off, n), g) =>
      (0 until n).map(i =>
        (g * 100L + i, (d0 + off) * dayNs + i * 1000000L, 1L, t, 1.0, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = EventOps.eventRateAnomaly(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSet
    assert(got === Set(
      ("a", d0 + 1, 6L, d0, 4L, true),     // 2*6 >= 3*4: spike (boundary)
      ("a", d0 + 2, 2L, d0 + 1, 6L, true), // 3*2 <= 2*6: drop
      ("b", d0 + 2, 5L, d0, 5L, true),     // missing day
      ("c", d0 + 1, 7L, d0, 6L, false)))
  }

  test("eventsPropsAgg extracts typed values from real JSON payloads") {
    import spark.implicits._
    val dir = scratchDir("graft-props")
    Seq(
      (0L, 1L, 1L, "view", 1.0, """{"k": 10}"""),
      (1L, 2L, 1L, "view", 1.0, """{"k": 32}"""),
      (2L, 3L, 2L, "click", 1.0, """not json"""),
      (3L, 4L, 2L, "click", 1.0, """{"other": 5}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.eventsPropsAgg(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_with_k"),
          Option(r.getAs[Any]("sum_k")))).toMap
    assert(got("view") === ((2L, 2L, Some(42L))))
    // malformed JSON and a missing key both degrade to NULL, not error
    assert(got("click") === ((2L, 0L, None)))
  }

  test("as-of join matches each event to the latest order at-or-before it") {
    import spark.implicits._
    val dir = scratchDir("graft-asof")
    val t0 = Fixtures.RefTs / 1000000000L // epoch seconds
    def ts(offS: Long) = new java.sql.Timestamp((t0 + offS) * 1000L)
    // user 1: orders at +10s (ok 100) and +30s (ok 101, and a same-instant
    // tie ok 102 -> max wins); events straddle all boundaries
    Seq((100L, 1L, ts(10)), (101L, 1L, ts(30)), (102L, 1L, ts(30)))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(
      (0L, (t0 + 5) * 1000000000L, 1L, "view", 1.0, "{}"),   // before any order
      (1L, (t0 + 10) * 1000000000L, 1L, "view", 1.0, "{}"),  // same instant: <= matches
      (2L, (t0 + 20) * 1000000000L, 1L, "view", 1.0, "{}"),
      (3L, (t0 + 40) * 1000000000L, 1L, "view", 1.0, "{}"),
      (4L, (t0 + 40) * 1000000000L, 2L, "view", 1.0, "{}"))  // user w/o orders
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = graft.operators.EventOps.eventsAsofOrder(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[Any]("last_order"))).toMap
    assert(got === Map(
      0L -> None,        // no prior order
      1L -> Some(100L),  // boundary: order at the same instant counts
      2L -> Some(100L),
      3L -> Some(102L),  // equal-date tie collapsed to max orderkey
      4L -> None))       // user with no orders at all
  }

  test("PIT training examples: features are strictly as-of, zero-history events zero-fill") {
    import spark.implicits._
    val dir = scratchDir("graft-pit")
    val t0 = Fixtures.RefTs / 1000000000L
    def ts(offS: Long) = new java.sql.Timestamp((t0 + offS) * 1000L)
    Seq(
      (100L, 1L, ts(10), 12.34),                // user 1, +10s
      (101L, 1L, ts(30), 5.0),                  // user 1, +30s
      (102L, 1L, ts(30), 7.0),                  // same instant as 101
      (103L, 3L, ts(-2L * 86400L), 1.0))        // user 3, two days before t0
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(
      (0L, (t0 + 5) * 1000000000L, 1L, "view", 1.0, "{}"),  // before any order
      (1L, (t0 + 10) * 1000000000L, 1L, "view", 1.0, "{}"), // same instant: counts
      (2L, (t0 + 40) * 1000000000L, 1L, "view", 1.0, "{}"), // after all three
      (3L, (t0 + 40) * 1000000000L, 2L, "view", 1.0, "{}"), // user w/o orders
      (4L, t0 * 1000000000L, 3L, "view", 1.0, "{}"))        // 2 days after order
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.trainingExamplesPit(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("n_orders_before"), r.getAs[Long]("spend_before_cents"),
          Option(r.getAs[Any]("days_since_last_order"))))).toMap
    assert(got === Map(
      0L -> ((0L, 0L, None)),           // leakage check: future orders invisible
      1L -> ((1L, 1234L, Some(0L))),    // same-instant order included (<=)
      2L -> ((3L, 2434L, Some(0L))),    // same-instant order pair both counted
      3L -> ((0L, 0L, None)),           // user with no orders at all
      4L -> ((1L, 100L, Some(2L)))))    // recency in whole days
  }

  test("HLL cardinality stays within rsd bounds of exact distinct counts") {
    val exact = graft.operators.EventOps.userCardinality(spark, fixtureDir)
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_users")).toMap
    val approx = graft.operators.EventOps.userCardinalityApprox(spark, fixtureDir)
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_users")).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (t, e) =>
      // rsd 2%; tiny fixture groups should be spot-on, allow 10% slack
      assert(math.abs(approx(t) - e) <= math.max(1L, (e * 0.1).toLong),
        s"$t: exact=$e approx=${approx(t)}")
    }
  }

  test("approx quantiles stay within sketch error of the exact percentiles") {
    val exact = EventOps.eventsValueQuantiles(spark, fixtureDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p95"))).toMap
    val approx = EventOps.eventsValueQuantilesApprox(spark, fixtureDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p95"))).toMap
    assert(exact.keySet === approx.keySet)
    // with accuracy 10000 and tiny groups the sketch is exact up to
    // rank-rounding: every approx quantile must be an actual group value
    // within one rank of the exact percentile — for the fixture's
    // 1-2-row groups that means equality at p50 boundaries chosen from
    // real data points
    exact.foreach { case (k, (_, e50, _)) =>
      val (_, a50, _) = approx(k)
      assert(math.abs(a50 - e50) <= math.max(0.5, e50 * 0.5),
        s"p50 for $k: exact=$e50 approx=$a50")
    }
  }

  test("sessionize: exactly-30-min gap stays in session; >30 min splits") {
    import spark.implicits._
    val dir = scratchDir("graft-sess")
    val base = Fixtures.RefTs // raw ns, read under nanosAsLong
    val m30 = 30L * 60L * 1000000000L
    Seq(
      (0L, base, 1L, "view", 1.0, "{}"),
      (1L, base + m30, 1L, "view", 1.0, "{}"),         // gap == 30 min: same session
      (2L, base + 2 * m30 + 1000L, 1L, "view", 1.0, "{}"), // gap 30min+1µs: new session
      (3L, base, 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.eventsSessionize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(5))).toMap
    assert(got((1L, 1L)) === (2L, m30 / 1000L)) // events 0+1, 30 min span
    assert(got((1L, 2L)) === (1L, 0L))          // event 2 alone
    assert(got((2L, 1L)) === (1L, 0L))
    assert(got.size === 3)
  }

  test("rolling 7-day active users: each (user, day) feeds exactly 7 report days") {
    import graft.operators.EventOps
    val d0 = Fixtures.RefTs / 1000000000L / 86400L // epoch day of ref (ns → s → days)
    val got = EventOps.rollingActiveUsers(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // fixture event days: user1 at d0 and d0-20, user2 at d0-14 and d0-30
    // report day d0 covers windows from d0-6..d0 → only user1's d0 event
    assert(got(d0) === 1L)
    // d0-14 is covered by BOTH user1's d0-20 window and user2's d0-14 event
    assert(got(d0 - 14) === 2L)
    // d0-30+6=d0-24: user2 (d0-30) only; d0-20: user1; overlap day d0-14..?
    assert(got(d0 - 24) === 1L)
    // every (user,day) pair contributes to exactly 7 report days:
    // 4 distinct (user,day) pairs → total memberships = 28
    assert(got.values.sum === 28L)
  }

  test("sequences: event-time order (not arrival order), cap applied before collect") {
    import spark.implicits._
    val dir = scratchDir("graft-seq")
    val base = Fixtures.RefTs
    // user 1 arrives out of order: event_id 10 carries the EARLIEST ts;
    // user 2 has 1 event; cap=2 must keep the two earliest by event time
    Seq(
      (10L, base, 1L, "purchase", 1.0, "{}"),
      (11L, base - 2000000000L, 1L, "view", 1.0, "{}"),
      (12L, base - 1000000000L, 1L, "click", 1.0, "{}"),
      (13L, base, 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val full = EventOps.eventsToSequences(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(full(1L) === ((3L, "view,click,purchase")))
    assert(full(2L) === ((1L, "view")))
    val capped = EventOps.eventsToSequences(spark, dir, maxLen = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(capped(1L) === ((2L, "view,click")))
  }

  test("transitions: per-user lag pairs with exact integer micro-probabilities") {
    import spark.implicits._
    val dir = scratchDir("graft-trans")
    val base = Fixtures.RefTs
    // user 1: view->click->view->click  user 2: view->purchase
    // context 'view': 2x ->click, 1x ->purchase; 'click': 1x ->view
    val evs = Seq(
      (0L, "view", 1L), (1L, "click", 1L), (2L, "view", 1L), (3L, "click", 1L),
      (4L, "view", 2L), (5L, "purchase", 2L))
    evs.map { case (i, t, u) => (i, base + i * 1000000000L, u, t, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.eventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(("view", "click")) === ((2L, 3L, 666666L)))     // 2/3 floored
    assert(got(("view", "purchase")) === ((1L, 3L, 333333L)))  // 1/3 floored
    assert(got(("click", "view")) === ((1L, 1L, 1000000L)))
    assert(got.size === 3)
  }

  test("late arrivals: fixture's out-of-order events flagged with exact lateness") {
    val dayUs = 86400L * 1000000L
    val got = EventOps.eventsLateArrivals(spark, fixtureDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // user 1: click (event 1) arrives after view (event 0) but is 20
    // days earlier in event time; user 2: error is 16 days behind view
    assert(got("click") === ((1L, 1L, 20 * dayUs)))
    assert(got("error") === ((1L, 1L, 16 * dayUs)))
    assert(got("view") === ((2L, 0L, 0L)))
  }

  test("k-anonymity: cells under 5 distinct users flagged, others released") {
    import spark.implicits._
    val dir = scratchDir("graft-kanon")
    val base = Fixtures.RefTs
    // band 0 (value 5.0): 3 distinct users over 4 events → suppressed;
    // band 1 (value 15.0): 6 distinct users → released
    val rows =
      Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 3L)).map { case (e, u) =>
        (e, base + e * 1000L, u, "view", 5.0, "{}")
      } ++ (0 until 6).map(i => (10L + i, base + i * 1000L, 10L + i, "view", 15.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.kanonSuppression(spark, dir).collect()
      .map(r => r.getLong(2) -> ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got === Map(
      0L -> ((3L, 4L, true)),
      1L -> ((6L, 6L, false))))
  }

  test("band join: lo inclusive, hi exclusive, uneven widths") {
    import spark.implicits._
    val dir = scratchDir("graft-band")
    Seq(
      (0L, 1L, 1L, "view", 0.0, "{}"),    // b0 lo boundary
      (1L, 2L, 1L, "view", 0.999, "{}"),  // b0
      (2L, 3L, 1L, "view", 1.0, "{}"),    // b1 (hi of b0 is exclusive)
      (3L, 4L, 1L, "view", 2.5, "{}"),    // b2
      (4L, 5L, 1L, "view", 99.999, "{}"), // b6
      (5L, 6L, 1L, "view", 100.0, "{}"),  // b7 open tail
      (6L, 7L, 1L, "view", 5000.0, "{}")) // beyond maxBucket clamp
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Intervals.eventsValueBandJoin(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("b0_lt1" -> 2L, "b1_1_2p5" -> 1L, "b2_2p5_5" -> 1L,
      "b6_50_100" -> 1L, "b7_ge100" -> 2L))
  }

  test("incident overlap: burst day only; cross-midnight session overlaps exactly to the day edge") {
    import spark.implicits._
    val dir = scratchDir("graft-incident")
    val d0 = Fixtures.RefTs // 2024-01-01 00:00 UTC in ns — a UTC midnight
    val h = 3600L * 1000000000L; val m = 60L * 1000000000L
    Seq(
      // u1: three errors on day0 within one session (10-min gaps)
      (0L, d0 + 10 * h, 1L, "error", 1.0, "{}"),
      (1L, d0 + 10 * h + 10 * m, 1L, "error", 1.0, "{}"),
      (2L, d0 + 10 * h + 20 * m, 1L, "error", 1.0, "{}"),
      // u1: lone error on day1 — separate session, day1 is NOT an incident
      (3L, d0 + 24 * h + 5 * h, 1L, "error", 1.0, "{}"),
      // u2: one session CROSSING midnight (23:50 → 00:05, 15-min gap)
      (4L, d0 + 23 * h + 50 * m, 2L, "error", 1.0, "{}"),
      (5L, d0 + 24 * h + 5 * m, 2L, "error", 1.0, "{}"),
      // u3: views, uniform 1/day → view never reaches the burst threshold
      (6L, d0 + 1 * h, 3L, "view", 1.0, "{}"),
      (7L, d0 + 24 * h + 1 * h, 3L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // error counts: day0 = 4, day1 = 2, mean 3 → only day0 ≥ 1.15×mean.
    // Sessions meet incidents by time alone (u3's view-only session on
    // the burst day is a zero-duration point touch) — the join asks
    // "who was on during the incident", not "who emitted its events".
    val got = EventOps.eventsIncidentOverlap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      (1L, "error") -> ((1L, 1L, 20L * 60L * 1000000L)), // within-day session: s1−s0
      (2L, "error") -> ((1L, 1L, 10L * 60L * 1000000L - 1L)), // clipped at day edge
      (3L, "error") -> ((1L, 1L, 0L)))) // point session: zero overlap, still a touch
  }

  test("count-min estimate never undercounts, is ≤ total, and gates on 1.2× mean volume") {
    import spark.implicits._
    val dir = scratchDir("graft-cms")
    val base = Fixtures.RefTs
    val evs = (0 until 12).map(i => (i.toLong, base + i * 1000000000L, 1L, "view", 1.0, "{}")) ++
      (0 until 2).map(i => (100L + i, base + i * 1000000000L, 2L, "view", 1.0, "{}")) ++
      (0 until 2).map(i => (200L + i, base + i * 1000000000L, 3L, "view", 1.0, "{}"))
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // mean = 16/3 ≈ 5.33; only u1 (12) clears the 1.2× gate
    val got = EventOps.userCmsTopk(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSet === Set(1L))
    val r = got.head
    assert(r.getLong(1) === 12L)
    assert(r.getLong(2) >= 12L && r.getLong(2) <= 16L) // admissible, ≤ stream length
    assert(r.getLong(3) === r.getLong(2) - 12L)
  }

  test("eventsUserLifespan: last-first day spread with distinct active days") {
    // user 1: events at ref and ref-20d → lifespan 20, 2 active days;
    // user 2: ref-14d and ref-30d → lifespan 16, 2 active days
    val got = EventOps.eventsUserLifespan(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(20L -> ((1L, 2L)), 16L -> ((1L, 2L))))
  }

  test("eventsDwellTime: gaps attribute to the LATER event's type in exact seconds") {
    // user 1: click(-20d) → view(ref): 20d gap under "view";
    // user 2: error(-30d) → view(-14d): 16d gap under "view"
    val got = EventOps.eventsDwellTime(spark, fixtureDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val day = 86400L
    assert(got === Map("view" -> ((2L, 36L * day, 18.0 * day))))
  }

  test("eventRateMad: uniform daily rates give zero MAD and zero anomalies") {
    // every fixture (type, day) count is 1 → median 1, all deviations 0,
    // MAD 0, and the strict > gate flags nothing
    val got = EventOps.eventRateMad(spark, fixtureDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got === Map(
      "view" -> ((2L, 1.0, 0.0, 0L)),
      "click" -> ((1L, 1.0, 0.0, 0L)),
      "error" -> ((1L, 1.0, 0.0, 0L))))
  }

  test("abTestChi2: a zero purchase margin yields NULL chi2, not an abort") {
    // fixture has no purchase events → a = c = 0 → the (a+c) margin is
    // zero and chi2 must be NULL (the guard), never a divide-by-zero
    val r = EventOps.abTestChi2(spark, fixtureDir).collect().head
    assert(r.getLong(0) === 0L && r.getLong(2) === 0L)
    assert(r.getLong(1) + r.getLong(3) === 4L)
    assert(r.isNullAt(4))
  }

  test("eventTrigramPaths: windows shorter than 3 yield nothing; paths order by time") {
    // fixture users have 2 events each → no trigrams at all
    assert(EventOps.eventTrigramPaths(spark, fixtureDir).collect().isEmpty)
    // 4-event user: exactly the two overlapping trigrams, in ts order
    import spark.implicits._
    val dir = scratchDir("graft-tri")
    val t0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    Seq(
      (0L, t0, 9L, "view", 1.0, "{}"),
      (1L, t0.plusMinutes(1), 9L, "click", 1.0, "{}"),
      (2L, t0.plusMinutes(2), 9L, "purchase", 1.0, "{}"),
      (3L, t0.plusMinutes(3), 9L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.eventTrigramPaths(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("view>click>purchase" -> 1L, "click>purchase>view" -> 1L))
  }

  test("eventsValueEcdf: probe counts are cumulative and boundary values count (<=)") {
    // fixture values 1.0, 1.0, 2.0, 0.5 → 0.5 catches one (boundary
    // inclusive), 1.0 three, 2.0 and beyond all four
    val got = EventOps.eventsValueEcdf(spark, fixtureDir).collect()
      .map(r => r.getDouble(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(0.5) === ((1L, 0.25)))
    assert(got(1.0) === ((3L, 0.75)))
    Seq(2.0, 5.0, 10.0, 20.0, 50.0, 100.0).foreach { p =>
      assert(got(p) === ((4L, 1.0)))
    }
  }

  test("sessionDurationBands: single-event sessions band at 0 via the +1 shift") {
    // fixture events are days apart → four 1-event sessions, duration 0
    // → bin(0+1)='1' → band 0
    val got = EventOps.sessionDurationBands(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(0L -> ((4L, 4L, 0L))))
  }

  test("eventsTimeToConvert: only first-view-before-first-purchase users count") {
    // fixture has no purchases → empty
    assert(EventOps.eventsTimeToConvert(spark, fixtureDir).collect().isEmpty)
    import spark.implicits._
    val dir = scratchDir("graft-ttc")
    val t0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    Seq(
      (0L, t0, 1L, "view", 1.0, "{}"),                    // converts after 5h
      (1L, t0.plusHours(5), 1L, "purchase", 1.0, "{}"),
      (2L, t0.plusHours(1), 2L, "purchase", 1.0, "{}"),   // purchase BEFORE view
      (3L, t0.plusHours(2), 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.eventsTimeToConvert(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // 5 hours → bin(6)='110' → band 2; user 2 excluded
    assert(got === Map(2L -> ((1L, 5L, 5L))))
  }

  test("userStickiness: DAU/MAU from exact per-month integer sums") {
    // month 657 (ref day): 1 day, 1 user → 1.0;
    // month 656 (days -14/-20/-30): 3 active days over 2 users → 0.5
    val got = EventOps.userStickiness(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got === Map(
      657L -> ((1L, 1L, 1L, 1.0)),
      656L -> ((3L, 3L, 2L, 0.5))))
  }

  test("activityPowerlawAlpha: closed form on the two-events-per-user fixture") {
    val r = EventOps.activityPowerlawAlpha(spark, fixtureDir).collect().head
    val lnr = math.floor(math.log(2.0 / 1.5) * 1e6).toLong
    assert(r.getLong(0) === 2L && r.getLong(1) === 2 * lnr)
    assert(r.getDouble(2) === 1.0 + 2.0 * 1e6 / (2 * lnr).toDouble)
  }

  test("eventsValueDriftPsi: unchanged bins contribute zero; shifted mass is symmetric") {
    // fixture split at mid-day 19708: first half vm {1000, 500},
    // second {1000, 2000} → bin 9 unchanged (psi 0), bin 8 loses the
    // mass bin 10 gains (symmetric ± terms)
    val got = EventOps.eventsValueDriftPsi(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(9L) === ((1L, 1L, 0.0)))
    val (a1, a2, lossTerm) = got(8L)
    val (b1, b2, gainTerm) = got(10L)
    assert((a1, a2) === ((1L, 0L)) && (b1, b2) === ((0L, 1L)))
    assert(lossTerm > 0.0 && gainTerm > 0.0) // both directions penalize
    // |ln(1/2)| and |ln(2)| micro-floors differ by 1 → near-equal terms
    assert(math.abs(lossTerm - gainTerm) < 1e-6)
  }

  test("userBehaviorEntropy: two-type users land exactly ln(2) micro-nats") {
    // both fixture users: one event of each of two types → Σ c·ln c = 0,
    // entropy = floor(ln(2)·10⁶)
    val ln2 = math.floor(math.log(2.0) * 1e6).toLong
    val got = EventOps.userBehaviorEntropy(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(1L -> ((2L, 2L, ln2)), 2L -> ((2L, 2L, ln2))))
  }

  test("markovEntropyRate: deterministic chains have zero entropy rate") {
    // fixture: each user contributes one transition whose current state
    // fully determines the next → every c_cn equals its c_c → rate 0
    val r = EventOps.markovEntropyRate(spark, fixtureDir).collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 0L)
  }

  test("eventTypeAffinity: Jaccard from exact user-set overlaps; disjoint pairs absent") {
    // fixture user sets: view={1,2}, click={1}, error={2} →
    // (click,view): 1/2; (error,view): 1/2; (click,error): disjoint → no row
    val got = EventOps.eventTypeAffinity(spark, fixtureDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got === Map(
      ("click", "view") -> ((1L, 1L, 2L, 0.5)),
      ("error", "view") -> ((1L, 1L, 2L, 0.5))))
  }

  test("eventsFunnelByVariant: stage totals reconcile with the un-split funnel") {
    val byVariant = EventOps.eventsFunnelByVariant(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val overall = EventOps.eventsFunnel(spark, fixtureDir).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    // summing the variant split must reproduce the overall funnel
    val summed = byVariant.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    assert(summed === overall)
    assert(byVariant.keys.forall { case (v, _) => v == 0L || v == 1L })
  }

  test("valuesBenfordDigits: digits from milli-integer strings; shares against baked literals") {
    // fixture values 1.0, 1.0, 2.0, 0.5 → milli 1000, 1000, 2000, 500
    // → first digits 1, 1, 2, 5
    val got = EventOps.valuesBenfordDigits(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got(1L) === ((2L, 0.5, 0.301029)))
    assert(got(2L) === ((1L, 0.25, 0.176091)))
    assert(got(5L) === ((1L, 0.25, 0.079181)))
    assert(got.size === 3)
  }

  test("eventsSeasonalResiduals: a flat series has zero residual everywhere") {
    // every fixture (type, day) count is 1 → each day equals its own
    // weekday mean exactly
    val rows = EventOps.eventsSeasonalResiduals(spark, fixtureDir).collect()
    assert(rows.length === 4)
    rows.foreach(r => assert(r.getLong(4) === 0L))
  }

  test("valuesWelchT: missing group yields NULLs; closed-form t on a planted split") {
    // fixture has zero purchase events → n1 = 0 → purchase mean and t NULL
    val fix = EventOps.valuesWelchT(spark, fixtureDir).collect().head
    assert(fix.getLong(0) === 0L && fix.isNullAt(2) && fix.isNullAt(4))
    assert(fix.getDouble(3) === 1.125) // (1 + 1 + 2 + 0.5) / 4
    // purchases {1,3} vs others {0,0}: v1 = 1, v2 = 0 → t = 2/√1 = 2
    import spark.implicits._
    val dir = scratchDir("graft-welch")
    val t0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    Seq(
      (0L, t0, 1L, "purchase", 1.0, "{}"), (1L, t0, 1L, "purchase", 3.0, "{}"),
      (2L, t0, 2L, "view", 0.0, "{}"), (3L, t0, 2L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventOps.valuesWelchT(spark, dir).collect().head
    assert(r.getDouble(2) === 2.0 && r.getDouble(3) === 0.0)
    assert(r.getDouble(4) === 2.0)
  }

  test("eventsHourProfile: midnight-only fixture concentrates every type's share at hour 0") {
    val got = EventOps.eventsHourProfile(spark, fixtureDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got === Map(
      ("view", 0L) -> ((2L, 1.0)),
      ("click", 0L) -> ((1L, 1.0)),
      ("error", 0L) -> ((1L, 1.0))))
  }

  test("eventsBurstiness: one-event-per-day users have zero dispersion; single-day users NULL") {
    // both fixture users: 2 days, 1 event each day → Fano = 0 exactly
    val got = EventOps.eventsBurstiness(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.get(3)))).toMap
    assert(got === Map(1L -> ((2L, 2L, 0L)), 2L -> ((2L, 2L, 0L))))
  }

  test("eventsAutocorrLag1: a perfectly alternating series gives r = -1; 1-pair series NULL") {
    // fixture 'view' has two days → one pair → zero variance → NULL;
    // 'click'/'error' have one day → no pairs → no row
    val fix = EventOps.eventsAutocorrLag1(spark, fixtureDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.get(2)))).toMap
    assert(fix === Map("view" -> ((1L, null))))
    // alternating 1,2,1,2 over four days → lag-1 r = -1 exactly
    import spark.implicits._
    val dir = scratchDir("graft-ac")
    val t0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    val rows = (0 until 4).flatMap { d =>
      val n = if (d % 2 == 0) 1 else 2
      (0 until n).map(i =>
        ((d * 10 + i).toLong, t0.plusDays(d).plusMinutes(i), 1L, "x", 1.0, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.eventsAutocorrLag1(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === Map("x" -> ((3L, -1.0))))
  }

  test("userActivityLog2Bands: band is the exact binary digit count minus one") {
    // both fixture users have 2 events → band 1 (binary '10')
    val got = EventOps.userActivityLog2Bands(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(1L -> ((2L, 2L, 2L))))
  }
}
