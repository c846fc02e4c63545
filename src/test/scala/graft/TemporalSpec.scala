package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join + gap sessionization (`Temporal`): planted-timeline
  * fixtures pin the boundary semantics (ties, no-prior-match, gap
  * threshold) that the oracle comparison alone can't localize.
  */
class TemporalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(minute: Long) = new Timestamp(minute * 60000L)

  test("asOfJoin: latest right at-or-before, tie inclusive, left-outer") {
    import spark.implicits._
    val left = Seq((10L, 1L, ts(0)), (11L, 1L, ts(5)), (12L, 1L, ts(7)),
      (13L, 1L, ts(12)), (14L, 2L, ts(6)))
      .toDF("lid", "k", "t")
    val right = Seq((100L, 1L, ts(1)), (101L, 1L, ts(5)), (102L, 1L, ts(10)),
      (103L, 2L, ts(9)))
      .toDF("rid", "k", "t")
    val out = Temporal.asOfJoin(left, right, "k", "t", Seq("lid"), Seq("rid"))
      .select(col("lid"), col("asof.rid").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(10L).isEmpty)        // before any right row
    assert(out(11L).contains(101L)) // equal ts matches (>= semantics)
    assert(out(12L).contains(101L)) // latest at-or-before, not just any
    assert(out(13L).contains(102L))
    assert(out(14L).isEmpty)        // other key's rows are invisible
  }

  test("asOfJoin rightTie: tied right timestamps match the max-tie row " +
    "deterministically") {
    import spark.implicits._
    // three right rows share (k=1, t=5) — without a tiebreak the match
    // is partition-order-dependent (r9 ADVICE); with rightTie the max
    // rid must win on every run
    val left = Seq((10L, 1L, ts(6))).toDF("lid", "k", "t")
    val right = Seq((101L, 1L, ts(5)), (103L, 1L, ts(5)), (102L, 1L, ts(5)),
      (99L, 1L, ts(1))).toDF("rid", "k", "t")
    (1 to 3).foreach { _ =>
      val out = Temporal.asOfJoin(left,
          right.repartition(7), // scramble partition order on purpose
          "k", "t", "t", Seq("lid"), Seq("rid"), rightTie = Some("rid"))
        .select(col("asof.rid")).as[Long].collect().toSeq
      assert(out == Seq(103L))
    }
  }

  test("gapSessionize: sessions split at the gap, exact durations") {
    import spark.implicits._
    // user 1: events at 0,10,20 min, then 5h silence, then 320,330 —
    // two sessions under a 4h gap; user 2 interleaved, one session
    val ev = Seq((0L, 1L, ts(0)), (1L, 1L, ts(10)), (2L, 1L, ts(20)),
      (3L, 1L, ts(320)), (4L, 1L, ts(330)),
      (5L, 2L, ts(15)), (6L, 2L, ts(25)))
      .toDF("event_id", "user_id", "ts")
    val out = Temporal
      .gapSessionize(ev, "user_id", "ts", "event_id", 4L * 3600 * 1000000)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 3L, 20L * 60000000, 0L, 2L),
      (1L, 2L, 2L, 10L * 60000000, 3L, 4L),
      (2L, 1L, 2L, 10L * 60000000, 5L, 6L)))
  }

  test("chained asOfJoin: null anchor from step 1 matches nothing in step 2") {
    import spark.implicits._
    // key 1: right row exists BEFORE the left anchor → match in step 1;
    // key 2: no prior right row → step-1 null anchor must stay null
    // through a second as-of instead of matching an arbitrary row
    val step1Left = Seq((1L, 1L, ts(10)), (2L, 2L, ts(10))).toDF("lid", "k", "t")
    val step1Right = Seq((100L, 1L, ts(5))).toDF("mid", "k", "t")
    val anchored = Temporal.asOfJoin(step1Left, step1Right, "k", "t",
        Seq("lid"), Seq("mid", "t"))
      .select(col("lid"), col("k"), col("asof.mid").as("mid"),
        col("asof.t").as("anchor_t"))
    val step2Right = Seq((200L, 1L, ts(3)), (201L, 2L, ts(1)))
      .toDF("vid", "k", "t")
    val out = Temporal.asOfJoin(anchored, step2Right, "k", "anchor_t", "t",
        Seq("lid", "mid"), Seq("vid"))
      .select(col("lid"), col("mid"), col("asof.vid").as("vid"))
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (Some(100L), Some(200L))) // anchored at t=5, view t=3
    // key 2 HAS a step-2 row at t=1, but the null anchor must not see it
    assert(out(2L) == (None, None))
  }

  test("retentionCohorts: cohort = first-event day, rate vs cohort size") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    // A: first day 1, back on day 3; B: day 1 only; C: first day 2, day 4
    val ev = Seq((1L, t("2024-01-01 08:00:00")), (1L, t("2024-01-03 09:00:00")),
      (2L, t("2024-01-01 10:00:00")),
      (3L, t("2024-01-02 11:00:00")), (3L, t("2024-01-04 12:00:00")))
      .toDF("user_id", "ts")
    val out = Temporal.retentionCohorts(ev, "user_id", "ts")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", "2024-01-01", 2L, 1.0),
      ("2024-01-01", "2024-01-03", 1L, 0.5),
      ("2024-01-02", "2024-01-02", 1L, 1.0),
      ("2024-01-02", "2024-01-04", 1L, 1.0)))
  }

  test("gapSessionize: exactly-at-gap stays in session, 1us over splits") {
    import spark.implicits._
    val gapUs = 60L * 1000000 // 1 minute
    val ev = Seq((0L, 1L, new Timestamp(0)),
      (1L, 1L, new Timestamp(60000)),       // exactly 60s later: same session
      (2L, 1L, new Timestamp(120001)))      // 60.001s later: new session
      .toDF("event_id", "user_id", "ts")
    val out = Temporal.gapSessionize(ev, "user_id", "ts", "event_id", gapUs)
      .select("session_seq", "n_events").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (2L, 1L)))
  }

  test("rangeJoin: half-open boundaries, multi-bin spans, inverted intervals") {
    import spark.implicits._
    val pts = Seq((1L, ts(0)), (2L, ts(5)), (3L, ts(10)), (4L, ts(17)))
      .toDF("pid", "t")
    // i10: [5, 10) — pid 2 in, pid 3 at end-exclusive boundary OUT
    // i11: [0, 17) — spans many 2-min bins, catches pids 1,2,3; 17 excluded
    // i12: [12, 12) — empty, matches nothing
    // i13: [20, 8)  — inverted, matches nothing (and must not crash
    //                 sequence() with a descending range)
    val iv = Seq((10L, ts(5), ts(10)), (11L, ts(0), ts(17)),
      (12L, ts(12), ts(12)), (13L, ts(20), ts(8)))
      .toDF("iid", "s", "e")
    val out = Temporal.rangeJoin(pts, "t", iv, "s", "e",
        binUs = 2L * 60 * 1000000)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set((2L, 10L), (1L, 11L), (2L, 11L), (3L, 11L)))
  }

  test("rangeJoin: pairs equal the brute-force condition on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = (0 until 300).map(i => (i.toLong,
      new Timestamp(rnd.nextInt(3600) * 1000L))).toDF("pid", "t")
    val ivs = (0 until 120).map { i =>
      val s = rnd.nextInt(3600) * 1000L
      // lengths from sub-bin to several bins (bin = 97s, deliberately
      // not dividing anything evenly)
      (1000L + i, new Timestamp(s), new Timestamp(s + rnd.nextInt(400) * 1000L))
    }.toDF("iid", "s", "e")
    val got = Temporal.rangeJoin(pts, "t", ivs, "s", "e", binUs = 97000000L)
      .select("pid", "iid").as[(Long, Long)].collect()
    val exp = pts.join(ivs, col("t") >= col("s") && col("t") < col("e"))
      .select("pid", "iid").as[(Long, Long)].collect()
    assert(got.length == exp.length, "a pair duplicated or went missing")
    assert(got.toSet == exp.toSet)
  }

  test("rangeJoin: keyCols restrict matches to the same key") {
    import spark.implicits._
    val pts = Seq((1L, "a", ts(5)), (2L, "b", ts(5))).toDF("pid", "k", "t")
    val iv = Seq((10L, "a", ts(0), ts(10))).toDF("iid", "k", "s", "e")
    val out = Temporal.rangeJoin(pts, "t", iv, "s", "e",
        binUs = 60000000L, keyCols = Seq("k"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L)))
  }

  test("intervalOverlapJoin: closed boundaries, multi-shared-bin pairs " +
    "emit exactly once") {
    import spark.implicits._
    // a1 spans ~50 two-minute bins; b10 shares ~25 of them — the
    // first-shared-bin dedup must still emit the pair ONCE. b11 touches
    // a1 exactly at its endpoint (closed semantics: overlap). b12 is
    // zero-length INSIDE a1 (closed: overlap). b13 starts 1 min after
    // a1 ends: disjoint.
    val a = Seq((1L, ts(0), ts(100))).toDF("aid", "s", "e")
    val b = Seq((10L, ts(50), ts(150)), (11L, ts(100), ts(120)),
      (12L, ts(70), ts(70)), (13L, ts(101), ts(130)))
      .toDF("bid", "s2", "e2")
    val out = Temporal.intervalOverlapJoin(a, "s", "e", b, "s2", "e2",
        binUs = 2L * 60 * 1000000)
      .select("aid", "bid").as[(Long, Long)].collect().toList
    assert(out.sorted == List((1L, 10L), (1L, 11L), (1L, 12L)))
  }

  test("intervalOverlapJoin: pairs equal the brute-force condition on " +
    "random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def ivs(n: Int, idBase: Long) = (0 until n).map { i =>
      val s = rnd.nextInt(3600) * 1000L
      (idBase + i, new Timestamp(s),
        new Timestamp(s + rnd.nextInt(500) * 1000L))
    }
    val a = ivs(150, 0L).toDF("aid", "s", "e")
    val b = ivs(150, 1000L).toDF("bid", "s2", "e2")
    val got = Temporal.intervalOverlapJoin(a, "s", "e", b, "s2", "e2",
        binUs = 97000000L)
      .select("aid", "bid").as[(Long, Long)].collect()
    val exp = a.join(b, col("s") <= col("e2") && col("s2") <= col("e"))
      .select("aid", "bid").as[(Long, Long)].collect()
    assert(got.length == exp.length, "a pair duplicated or went missing")
    assert(got.toSet == exp.toSet)
  }

  test("peakConcurrency: day-boundary carry, half-open ends never " +
    "double-count") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val iv = Seq(
      (t("2024-01-01 23:00:00"), t("2024-01-02 01:00:00")), // crosses midnight
      (t("2024-01-01 23:30:00"), t("2024-01-01 23:45:00")),
      (t("2024-01-02 00:30:00"), t("2024-01-02 00:45:00")),
      // day 3: end meets start — [5,6) then [6,7): concurrency must
      // stay 1 at the 06:00 instant (the -1 sorts before the +1)
      (t("2024-01-03 05:00:00"), t("2024-01-03 06:00:00")),
      (t("2024-01-03 06:00:00"), t("2024-01-03 07:00:00")))
      .toDF("s", "e")
    val out = Temporal.peakConcurrency(iv, "s", "e")
      .as[(String, Long)].collect().toList
    // day 1 peak: both long windows open at 23:30 → 2
    // day 2 peak: midnight carry 1 + the 00:30 window → 2
    // day 3 peak: 1 — a peak of 2 means the tie rule broke
    assert(out == List(("2024-01-01", 2L), ("2024-01-02", 2L),
      ("2024-01-03", 1L)))
  }

  test("peakConcurrency: a day that only CLOSES carried intervals still " +
    "reports the midnight peak") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    // one window [23:58, 00:03): day 2's ONLY delta is its -1, so the
    // day's worst moment is the midnight instant (carry = 1); sampling
    // peaks only after deltas would report 1 + (-1) = 0
    val iv = Seq((t("2024-01-01 23:58:00"), t("2024-01-02 00:03:00")))
      .toDF("s", "e")
    val out = Temporal.peakConcurrency(iv, "s", "e")
      .as[(String, Long)].collect().toList
    assert(out == List(("2024-01-01", 1L), ("2024-01-02", 1L)))
  }

  test("rangeJoin: non-key column collision is rejected loudly") {
    import spark.implicits._
    val pts = Seq((1L, ts(0))).toDF("pid", "t")
    val iv = Seq((1L, ts(0), ts(1))).toDF("pid", "s", "e")
    val err = intercept[IllegalArgumentException] {
      Temporal.rangeJoin(pts, "t", iv, "s", "e", 1000000L)
    }
    assert(err.getMessage.contains("pid"))
  }
}
