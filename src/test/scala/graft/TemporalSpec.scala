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
}
