package graft

import graft.ops.Temporal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AS-OF join semantics (latest earlier right event, equal-ts
  * visibility, max-event_id tie rule, per-user isolation, null when no
  * prior) and the trailing RANGE-frame boundary contract.
  */
class TemporalSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def events(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("sec")).as("ts"),
        col("user_id"), col("event_type"), col("value"))

  test("asof: latest earlier view, equal-ts visible, null when none") {
    val df = events(
      (0L, 5L, 1L, "click", 0.0),   // before any view -> null
      (1L, 10L, 1L, "view", 1.25),
      (2L, 15L, 1L, "click", 0.0),  // -> view 1, gap 5s
      (3L, 20L, 1L, "view", 2.0),
      (4L, 20L, 1L, "click", 0.0),  // tie at equal ts -> view 3, gap 0
      (9L, 90L, 1L, "purchase", 0.0)) // other types never participate
    val got = Temporal.asofJoin(df).collect()
      .map(r => r.getLong(0) -> (Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toMap
    assert(got(0L) === ((None, None, None)))
    assert(got(2L) === ((Some(1L), Some(5000000L), Some(125L))))
    assert(got(4L) === ((Some(3L), Some(0L), Some(200L))))
    assert(!got.contains(9L))
  }

  test("asof: equal-ts views resolve to the largest event_id; users isolated") {
    val df = events(
      (5L, 30L, 1L, "view", 1.0),
      (6L, 30L, 1L, "view", 2.0),
      (7L, 30L, 1L, "click", 0.0), // both views at its own ts -> id 6 wins
      (8L, 40L, 2L, "click", 0.0)) // user 2 has no views -> null
    val got = Temporal.asofJoin(df).collect()
      .map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(got(7L) === Some(6L))
    assert(got(8L) === None)
  }

  test("funnel: first-touch attribution, window bounds, same-instant chains") {
    val W = 1800L // 30 min in seconds
    val df = events(
      // user 1: clean conversion (click +10m, purchase +10m after click)
      (1L, 0L, 1L, "view", 0.0), (2L, 600L, 1L, "click", 0.0),
      (3L, 1200L, 1L, "purchase", 0.0),
      // user 2: click in window, purchase 40m after the click -> clicked only
      (4L, 0L, 2L, "view", 0.0), (5L, 600L, 2L, "click", 0.0),
      (6L, 600L + 2400L, 2L, "purchase", 0.0),
      // user 3: first click 40m out -> view only (no back-tracking)
      (7L, 0L, 3L, "view", 0.0), (8L, 2400L, 3L, "click", 0.0),
      // user 4: view/click/purchase at the same instant -> converted
      (9L, 50L, 4L, "view", 0.0), (10L, 50L, 4L, "click", 0.0),
      (11L, 50L, 4L, "purchase", 0.0),
      // user 5: purchase BEFORE the click never attributes
      (12L, 0L, 5L, "purchase", 0.0), (13L, 10L, 5L, "view", 0.0),
      (14L, 20L, 5L, "click", 0.0))
    val got = graft.ops.Temporal.funnelCounts(df, windowUs = W * 1000000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) === ((1L, 1L, 1L)))
    assert(got(2L) === ((1L, 1L, 0L)))
    assert(got(3L) === ((1L, 0L, 0L)))
    assert(got(4L) === ((1L, 1L, 1L)))
    assert(got(5L) === ((1L, 1L, 0L)))
  }

  test("rolling range: trailing window includes the -window boundary exactly") {
    val df = events(
      (1L, 0L, 1L, "view", 1.0),
      (2L, 300L, 1L, "view", 1.0),
      (3L, 600L, 1L, "view", 1.0),  // [0, 600]: all three
      (4L, 601L, 1L, "view", 1.0),  // [1, 601]: 2,3,4 (event 1 just aged out)
      (5L, 601L, 2L, "view", 9.0))  // other user: own frame only
    val got = Temporal.rollingRange(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got(3L) === ((3L, 300L)))
    assert(got(4L) === ((3L, 300L)))
    assert(got(5L) === ((1L, 900L)))
  }

  test("interval join: boundary semantics, user isolation, no bucket dupes") {
    val D = 100L // seconds; durUs = 100e6
    val df = events(
      (1L, 0L, 1L, "view", 0.0),
      (2L, 100L, 1L, "click", 0.0),  // touches view 1's end -> overlap 0
      (3L, 101L, 1L, "click", 0.0),  // just past -> no pair with 1
      (4L, 50L, 1L, "click", 0.0),   // inside -> overlap 50s
      (5L, 30L, 2L, "click", 0.0),   // other user: isolated
      // straddles a bucket boundary BOTH sides (buckets 0 and 1 shared):
      // must appear exactly once despite two shared buckets
      (6L, 90L, 3L, "view", 0.0), (7L, 95L, 3L, "click", 0.0))
    val got = Temporal.intervalJoin(df, durUs = D * 1000000L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got === Map(
      (1L, 2L) -> 0L,
      (1L, 4L) -> 50000000L,
      (6L, 7L) -> 95000000L))
  }

  test("interval join equals the naive overlap join on a random fixture") {
    // brute-force ground truth over a dense fixture (many bucket spans,
    // equal-ts ties, multi-bucket overlaps)
    val rows = (0 until 300).map { i =>
      (i.toLong, (i * 37 % 500).toLong, (i % 7).toLong,
        if (i % 2 == 0) "view" else "click", 0.0)
    }
    val df = events(rows: _*)
    val D = 60L * 1000000L
    val got = Temporal.intervalJoin(df, durUs = D)
      .select("l_event_id", "r_event_id", "overlap_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ev = rows.map { case (id, sec, u, t, _) => (id, sec * 1000000L, u, t) }
    val naive = (for {
      (lid, ls, lu, lt) <- ev if lt == "view"
      (rid, rs, ru, rt) <- ev if rt == "click" && ru == lu &&
        ls <= rs + D && rs <= ls + D
    } yield (lid, rid, math.min(ls + D, rs + D) - math.max(ls, rs))).toSet
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("scd2: touches collapse, intervals chain, one open row per user") {
    val ev = events(
      (1L, 100L, 1L, "purchase", 5.0),
      (2L, 200L, 1L, "purchase", 5.0), // same value: a touch, collapsed
      (3L, 300L, 1L, "purchase", 7.5),
      (4L, 400L, 1L, "purchase", 5.0), // value may recur in a new interval
      (5L, 100L, 2L, "purchase", 1.0),
      (6L, 150L, 1L, "click", 9.9)) // non-purchase events never versioned
    val h = Temporal.scd2History(ev)
      .orderBy("user_id", "valid_from_us").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("cents"),
        r.getAs[Long]("valid_from_us"), Option(r.get(3)).map(_.toString.toLong),
        r.getAs[Int]("is_current")))
    val us = 1000000L
    assert(h.toSeq === Seq(
      (1L, 500L, 100L * us, Some(300L * us - 1), 0),
      (1L, 750L, 300L * us, Some(400L * us - 1), 0),
      (1L, 500L, 400L * us, None, 1),
      (2L, 100L, 100L * us, None, 1)))
    // chain invariant: within a user, valid_to + 1 == next valid_from,
    // and exactly one open (is_current) row
    h.groupBy(_._1).foreach { case (_, rows) =>
      rows.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3 - 1))
        case _ =>
      }
      assert(rows.count(_._5 == 1) === 1)
      assert(rows.last._4.isEmpty)
    }
  }
}
