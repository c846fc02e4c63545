package graft

import java.sql.Timestamp
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Watermarked windowed aggregation and mapGroupsWithState sessions over
  * MemoryStream micro-batches.
  */
class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streamingAsOf: cross-batch state, in-batch order, bounded-state late clicks") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.streaming.EventStreams.TypedEvent
    val in = MemoryStream[TypedEvent]
    val q = EventStreams.streamingAsOf(in.toDS()).writeStream
      .format("memory").queryName("sasof").outputMode("append").start()
    try {
      // batch 1: click before any view → no match; view then click in
      // the SAME batch (click arrives first in insertion order — the
      // (ts,id) sort must fix it) → exact µs lag
      in.addData(
        TypedEvent(1L, 7L, ts("2024-01-01 09:00:00"), "click"),
        TypedEvent(3L, 7L, ts("2024-01-01 10:05:00"), "click"),
        TypedEvent(2L, 7L, ts("2024-01-01 10:00:00"), "view"))
      q.processAllAvailable()
      // batch 2: the 10:00 view carried in state matches a later click;
      // a same-batch 12:00 view does NOT steal the 11:30 click — the
      // (ts, id) sort processes the click first, so in-batch disorder
      // is repaired exactly
      in.addData(
        TypedEvent(4L, 7L, ts("2024-01-01 11:00:00"), "click"),
        TypedEvent(5L, 7L, ts("2024-01-01 12:00:00"), "view"),
        TypedEvent(6L, 7L, ts("2024-01-01 11:30:00"), "click"))
      q.processAllAvailable()
      // batches 3+4: a click arriving a BATCH AFTER a newer view has
      // replaced its true match reports no match — bounded state never
      // attributes backwards in time (the documented approximation)
      in.addData(TypedEvent(7L, 7L, ts("2024-01-01 13:00:00"), "view"))
      q.processAllAvailable()
      in.addData(TypedEvent(8L, 7L, ts("2024-01-01 12:30:00"), "click"))
      q.processAllAvailable()
      val rows = spark.table("sasof")
        .as[(Long, Long, Option[Long], Option[Long])].collect()
        .map(r => r._1 -> (r._3, r._4)).toMap
      assert(rows(1L) == (None, None))              // no prior view
      assert(rows(3L) == (Some(2L), Some(300L * 1000000))) // same batch, 5 min
      assert(rows(4L) == (Some(2L), Some(3600L * 1000000))) // state crossed batches
      assert(rows(6L) == (Some(2L), Some(5400L * 1000000))) // in-batch repair
      assert(rows(8L) == (None, None))              // cross-batch late click
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS sasof") }
  }

  test("streamingAsOf: a same-batch click at a view's exact ts matches it " +
    "even when the view's id is larger") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.streaming.EventStreams.TypedEvent
    // batch q79's >= tie semantics: click(id 3) at ts T attributes to
    // view(id 5) at the same T — the (ts, side, id) sort processes the
    // view first despite its larger event_id
    val in = MemoryStream[TypedEvent]
    val q = EventStreams.streamingAsOf(in.toDS()).writeStream
      .format("memory").queryName("sasof_tieclick").outputMode("append").start()
    try {
      in.addData(
        TypedEvent(3L, 7L, ts("2024-01-01 10:00:00"), "click"),
        TypedEvent(5L, 7L, ts("2024-01-01 10:00:00"), "view"))
      q.processAllAvailable()
      val rows = spark.table("sasof_tieclick")
        .as[(Long, Long, Option[Long], Option[Long])].collect()
        .map(r => r._1 -> (r._3, r._4)).toMap
      assert(rows(3L) == (Some(5L), Some(0L)), "tied view must win, lag 0")
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS sasof_tieclick") }
  }

  test("streamingAsOf: tied view timestamps resolve to max id across batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.streaming.EventStreams.TypedEvent
    // Two users, each with two views at the SAME timestamp but delivered
    // in opposite cross-batch orders (user 7: high id then low; user 8:
    // low id then high). The batch asOfJoin's rightTie picks the max
    // event_id for both, so the streaming form must too — arrival order
    // must not leak into the attribution.
    val in = MemoryStream[TypedEvent]
    val q = EventStreams.streamingAsOf(in.toDS()).writeStream
      .format("memory").queryName("sasof_ties").outputMode("append").start()
    try {
      in.addData(
        TypedEvent(20L, 7L, ts("2024-01-01 10:00:00"), "view"),
        TypedEvent(10L, 8L, ts("2024-01-01 10:00:00"), "view"))
      q.processAllAvailable()
      in.addData(
        TypedEvent(10L, 7L, ts("2024-01-01 10:00:00"), "view"),
        TypedEvent(20L, 8L, ts("2024-01-01 10:00:00"), "view"))
      q.processAllAvailable()
      in.addData(
        TypedEvent(30L, 7L, ts("2024-01-01 11:00:00"), "click"),
        TypedEvent(30L, 8L, ts("2024-01-01 11:00:00"), "click"))
      q.processAllAvailable()
      val rows = spark.table("sasof_ties")
        .as[(Long, Long, Option[Long], Option[Long])].collect()
        .map(r => r._2 -> r._3).toMap
      assert(rows(7L) == Some(20L), "smaller tied id arriving later stole state")
      assert(rows(8L) == Some(20L), "larger tied id arriving later must replace")
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS sasof_ties") }
  }

  test("streamingIntervalJoin: cross-batch match, boundary inclusivity, " +
    "window exclusion") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.streaming.EventStreams.TypedEvent
    val in = MemoryStream[TypedEvent]
    val q = EventStreams.streamingIntervalJoin(in.toDF()).writeStream
      .format("memory").queryName("sij").outputMode("append").start()
    try {
      // batch 1: two views for user 7; a click exactly AT a view's ts
      // must match it (inclusive upper bound)
      in.addData(
        TypedEvent(1L, 7L, ts("2024-01-01 09:30:00"), "view"),
        TypedEvent(2L, 7L, ts("2024-01-01 10:00:00"), "view"),
        TypedEvent(3L, 7L, ts("2024-01-01 10:00:00"), "click"))
      q.processAllAvailable()
      // batch 2: a click 59 min after view 2 matches BOTH buffered
      // views? view 1 is 89 min before -> OUTSIDE the 1h window; a
      // click exactly 1h after view 2 is ON the inclusive lower bound
      in.addData(
        TypedEvent(4L, 7L, ts("2024-01-01 10:59:00"), "click"),
        TypedEvent(5L, 7L, ts("2024-01-01 11:00:00"), "click"),
        TypedEvent(6L, 8L, ts("2024-01-01 10:30:00"), "click")) // no views
      q.processAllAvailable()
      val rows = spark.table("sij").collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("view_id"),
          r.getAs[Long]("lag_us"))).toSet
      assert(rows == Set(
        (3L, 1L, 30L * 60 * 1000000),  // in-batch, 30 min lag
        (3L, 2L, 0L),                  // ts-equal view matches (<=)
        (4L, 2L, 59L * 60 * 1000000),  // cross-batch buffered view
        (5L, 2L, 3600L * 1000000)))    // exactly 1h: inclusive bound
      // user 8's click produced nothing (inner join, no view)
      assert(!rows.exists(_._1 == 6L))
    } finally q.stop()
  }

  test("windowedCounts aggregates per hour window and drops late data") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.windowedCounts(df).writeStream
      .format("memory").queryName("wc").outputMode("update").start()
    in.addData(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:45:00"), "click", 2.0),
      (ts("2024-01-01 11:10:00"), "view", 5.0))
    q.processAllAvailable()
    // event far behind the watermark (advanced to ~10:10 by the 11:10 max)
    in.addData((ts("2024-01-01 08:00:00"), "click", 9.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wc")
      .groupBy("window_start", "event_type").sum("n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(rows.contains((ts("2024-01-01 10:00:00"), "click", 2L)))
    assert(rows.contains((ts("2024-01-01 11:00:00"), "view", 1L)))
    // the 08:00 event fell behind the watermark → its window never appears
    assert(!rows.exists(_._1 == ts("2024-01-01 08:00:00")))
  }

  test("streamingDedup emits each content hash once within the watermark") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Option[String])]
    val df = in.toDF().toDF("doc_id", "ts", "text")
    val q = EventStreams.streamingDedup(df).writeStream
      .format("memory").queryName("sd").outputMode("append").start()
    in.addData(
      (1L, ts("2024-01-01 10:00:00"), Some("same content")),
      (2L, ts("2024-01-01 10:01:00"), Some("same content")), // dup in-batch
      (3L, ts("2024-01-01 10:02:00"), Some("other content")),
      (5L, ts("2024-01-01 10:03:00"), None), // failed scrapes must NOT
      (6L, ts("2024-01-01 10:04:00"), None)) // collapse into one key
    q.processAllAvailable()
    // dup arriving in a LATER batch, still inside the watermark window
    in.addData((4L, ts("2024-01-01 10:30:00"), Some("same content")))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("sd").select("doc_id").as[Long].collect().toSet
    assert(ids.intersect(Set(1L, 2L, 4L)).size == 1) // one survivor per hash
    assert(ids.contains(3L))
    assert(ids.contains(5L) && ids.contains(6L)) // both null-text rows kept
    assert(ids.size == 4)
  }

  test("sessionWindows merges across batches, closes at the exact gap " +
    "boundary like the batch rule, and isolates users") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, Long, Timestamp)]
    val df = in.toDF().toDF("event_id", "user_id", "ts")
    val q = EventStreams.sessionWindows(df).writeStream
      .format("memory").queryName("sw").outputMode("append").start()
    in.addData(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 1L, ts("2024-01-01 13:59:00")), // 3h59m gap: same session
      (3L, 2L, ts("2024-01-01 10:00:00")),
      // the batch rule is "same session iff diff ≤ 4h": an exactly-4h
      // follower must MERGE (the +1µs on the Spark gap is load-bearing)
      (6L, 3L, ts("2024-01-01 10:00:00")),
      (7L, 3L, ts("2024-01-01 14:00:00")))
    q.processAllAvailable()
    in.addData(
      (4L, 1L, ts("2024-01-01 14:30:00")), // merges user 1's open session
      (5L, 1L, ts("2024-01-01 23:00:00"))) // 8.5h gap: new session
    q.processAllAvailable()
    // flush sentinel: advance the watermark past every session's end
    in.addData((-1L, -1L, ts("2024-01-04 00:00:00")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sw").filter($"user_id" >= 0).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_events"),
        r.getAs[Long]("dur_us"), r.getAs[Long]("min_event_id"),
        r.getAs[Long]("max_event_id"))).toSet
    assert(rows == Set(
      (1L, 3L, 16200000000L, 1L, 4L), // 10:00→14:30 across two batches
      (1L, 1L, 0L, 5L, 5L),
      (2L, 1L, 0L, 3L, 3L),
      (3L, 2L, 14400000000L, 6L, 7L))) // exact-boundary merge
  }

  test("sessionize keeps per-user state across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionize(in.toDS()).writeStream
      .format("memory").queryName("sess").outputMode("update").start()

    // ProcessingTimeTimeout keeps the query triggering timeout-evaluation
    // batches, so processAllAvailable never observes a quiescent stream —
    // poll the sink with a deadline instead
    def latest(): Map[Long, Long] = spark.table("sess")
      .groupBy("user_id").max("n_events")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def awaitState(expected: Map[Long, Long]): Unit = {
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (latest() != expected && System.nanoTime() < deadline)
        Thread.sleep(500)
      assert(latest() == expected, s"timed out waiting for $expected")
    }

    in.addData(Event(1L, ts("2024-01-01 10:00:00"), "click"),
      Event(1L, ts("2024-01-01 10:01:00"), "view"),
      Event(2L, ts("2024-01-01 10:00:30"), "click"))
    awaitState(Map(1L -> 2L, 2L -> 1L))
    in.addData(Event(1L, ts("2024-01-01 10:02:00"), "click"))
    awaitState(Map(1L -> 3L, 2L -> 1L)) // state accumulated across batches
    q.stop()
  }

  test("streamingNearDup pairs docs within and across micro-batches, bands agree with batch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val df = in.toDF().toDF("doc_id", "text")
    val q = EventStreams.streamingNearDup(df).writeStream
      .format("memory").queryName("snd").outputMode("append").start()
    val t = "the quick brown fox jumps over the lazy dog again and again today"
    def pairs(): Set[(Long, Long)] = spark.table("snd")
      .select("a", "b").as[(Long, Long)].collect().toSet
    def await(expected: Set[(Long, Long)]): Unit = {
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (pairs() != expected && System.nanoTime() < deadline)
        Thread.sleep(500)
      assert(pairs() == expected, s"timed out waiting for $expected")
    }
    in.addData((1L, t), (2L, t),
      (10L, "completely different words that share nothing with the fox sentence at all"))
    await(Set((1L, 2L))) // in-batch pair; the distinct doc pairs with nobody
    in.addData((3L, t)) // near-dup arriving in a LATER micro-batch
    await(Set((1L, 2L), (1L, 3L), (2L, 3L))) // state held across batches
    // identical docs collide in every band → multi-emission is per
    // (pair, band), never more
    val perBand = spark.table("snd").select("a", "b", "band")
      .as[(Long, Long, Int)].collect()
    assert(perBand.distinct.length == perBand.length)
    // jaccard from the streaming verify matches the batch definition
    val js = spark.table("snd").select("jaccard").as[Double].collect()
    assert(js.forall(_ == 1.0))
    q.stop()
  }

  test("streamingNearDup replaces a re-delivered doc_id in its buckets: updated set wins, no stale copies") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, explode, lit, struct}
    implicit val sql = spark.sqlContext
    val t = "the quick brown fox jumps over the lazy dog again and again today"
    // the update appends ONE word: 11 of 12 word-3-gram shingles shared
    // (jaccard ≈ 0.92, above threshold) and most MinHash positions
    // unchanged, so the updated doc re-visits buckets the original
    // occupies. Hashing is deterministic, so pick the first candidate
    // that provably shares ≥1 band with the original.
    def bandKeys(text: String): Set[(Int, Long)] = {
      val sig = Seq(Tuple1(text)).toDF("text")
        .select(TextOps.hashedShingleSet(col("text")).as("shset"))
        .select(col("shset") +: TextOps.sigCols(col("shset")): _*)
      sig.select(explode(array((0 until TextOps.bandsCount).map { j =>
          struct(lit(j).as("band"),
            (col(s"sig${2 * j}") * TextOps.P + col(s"sig${2 * j + 1}"))
              .as("key"))
        }: _*)).as("bk"))
        .select("bk.band", "bk.key").as[(Int, Long)].collect().toSet
    }
    val baseKeys = bandKeys(t)
    val tUpd = Vector("tonight", "maybe", "forever", "quietly", "zebra")
      .map(w => s"$t $w")
      .find(v => bandKeys(v).intersect(baseKeys).nonEmpty)
      .getOrElse(fail("no one-word update shares a band with the original"))
    val in = MemoryStream[(Long, String)]
    val q = EventStreams.streamingNearDup(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sndre")
      .outputMode("append").start()
    def rows(): Seq[(Long, Long, Double, Int)] = spark.table("sndre")
      .select("a", "b", "jaccard", "band")
      .as[(Long, Long, Double, Int)].collect().toSeq
    in.addData((1L, t))
    Thread.sleep(300)
    // doc 1 RE-DELIVERED in a later micro-batch with the updated text:
    // in every shared bucket the old entry must be REPLACED, not kept
    in.addData((1L, tUpd))
    Thread.sleep(300)
    // doc 2 carries the updated text, so it probes exactly the updated
    // doc's buckets — including the shared ones, where a surviving stale
    // copy would emit a SECOND (1,2) row in the same band at j ≈ 0.92
    in.addData((2L, tUpd))
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (rows().isEmpty && System.nanoTime() < deadline) Thread.sleep(500)
    val got = rows()
    assert(got.nonEmpty && got.forall(r => (r._1, r._2) == (1L, 2L)), s"$got")
    // exactly-once per (pair, band): one row per colliding band even
    // though doc 1 was delivered twice into the shared buckets
    assert(got.map(r => (r._1, r._2, r._4)).distinct.length == got.length,
      s"duplicate (pair, band) rows from stale bucket copies: $got")
    // and the UPDATED shingle set won: doc 2 is identical to the update,
    // so every verify must score 1.0 (the stale set would score ≈ 0.92)
    assert(got.forall(_._3 == 1.0),
      s"stale pre-update shingle set still matching: $got")
    q.stop()
  }

  test("streamingNearDupUnique emits exactly once per PAIR across bands and micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val df = in.toDF().toDF("doc_id", "ts", "text")
    val q = EventStreams.streamingNearDupUnique(df).writeStream
      .format("memory").queryName("sndu").outputMode("append").start()
    val t = "the quick brown fox jumps over the lazy dog again and again today"
    def pairs(): Seq[(Long, Long)] = spark.table("sndu")
      .select("a", "b").as[(Long, Long)].collect().toSeq
    def await(expected: Set[(Long, Long)]): Unit = {
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (pairs().toSet != expected && System.nanoTime() < deadline)
        Thread.sleep(500)
      assert(pairs().toSet == expected, s"timed out waiting for $expected")
    }
    // identical docs collide in EVERY band → the raw stage emits one row
    // per band; the pair-keyed dedup stage must collapse them to one
    in.addData((1L, ts("2024-01-01 10:00:00"), t),
      (2L, ts("2024-01-01 10:01:00"), t))
    await(Set((1L, 2L)))
    assert(pairs().size == 1, s"multi-band pair emitted more than once: ${pairs()}")
    // a third copy in a LATER micro-batch: new pairs (1,3) and (2,3)
    // appear once each; (1,2) must NOT re-emit inside the watermark
    in.addData((3L, ts("2024-01-01 10:02:00"), t))
    await(Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val all = pairs()
    assert(all.distinct.length == all.length,
      s"pair emitted more than once across micro-batches: $all")
    q.stop()
  }

  test("streamingNearDupUnique re-emits a pair re-discovered after the watermark") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val df = in.toDF().toDF("doc_id", "ts", "text")
    val q = EventStreams.streamingNearDupUnique(df, pairWatermark = "1 hour")
      .writeStream.format("memory").queryName("sndw")
      .outputMode("append").start()
    val t = "the quick brown fox jumps over the lazy dog again and again today"
    def count12(): Long = spark.table("sndw")
      .filter(col("a") === 1L && col("b") === 2L).count()
    def await(n: Long): Unit = {
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (count12() != n && System.nanoTime() < deadline) Thread.sleep(500)
      assert(count12() == n, s"timed out waiting for $n (1,2) rows")
    }
    in.addData((1L, ts("2024-01-01 10:00:00"), t),
      (2L, ts("2024-01-01 10:01:00"), t))
    await(1)
    // the pair-dedup watermark rides the PAIR stream's event time, so it
    // only advances while pairs flow (the steady state of a production
    // near-dup feed): an unrelated dup pair 3 h later pushes it past the
    // (1,2) entry (1 h delay), purging it
    val u = "an unrelated watermark advancing duplicate sentence with plenty of distinct words"
    in.addData((100L, ts("2024-01-01 13:00:00"), u),
      (101L, ts("2024-01-01 13:00:30"), u))
    val deadline2 = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (spark.table("sndw").filter(col("a") === 100L).count() == 0 &&
      System.nanoTime() < deadline2) Thread.sleep(500)
    // one more micro-batch so the advanced watermark takes effect for
    // eviction (state cleanup uses the PREVIOUS batch's watermark)
    Thread.sleep(500)
    // re-delivering doc 1 re-discovers (1,2) from the bucket state; the
    // pair's dedup entry expired with the watermark → it RE-EMITS (the
    // documented re-scrape-is-a-new-observation posture), exactly once
    in.addData((1L, ts("2024-01-01 13:01:00"), t))
    await(2)
    q.stop()
  }

  test("streamingNearDup equals the batch LSH pipeline on a static corpus") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // deterministic corpus: 5 templates × 3 variants; v1 is an exact copy
    // of v0, v2 swaps the last word (jaccard ≈ 0.82 — near the threshold,
    // so band-collision probabilism is exercised, not just certainties)
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
    def doc(t: Int, v: Int): String = {
      val base = (0 until 12).map(i => words((t * 3 + i) % 12))
      (if (v == 2) base.updated(11, words((t * 3 + 5) % 12)) else base)
        .mkString(" ")
    }
    val corpus = for (t <- 0 until 5; v <- 0 until 3)
      yield ((t * 10 + v).toLong, doc(t, v))
    def pairSet(rows: Seq[(Long, Long, Double)]): Set[(Long, Long, Double)] =
      rows.toSet
    // batch: the flagship lshVerifiedPairs, threshold-filtered
    val batch = pairSet(graft.TextOps
      .lshVerifiedPairs(corpus.toDF("doc_id", "text"), "doc_id", "text")._2
      .filter(col("jaccard") >= 0.8)
      .as[(Long, Long, Double)].collect().toSeq)
    Caches.clear()
    // stream: same corpus in three micro-batches, grouped by variant so
    // every cross-variant pair must be found ACROSS batches from state
    val in = MemoryStream[(Long, String)]
    val q = EventStreams.streamingNearDup(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sndeq")
      .outputMode("append").start()
    // NO processAllAvailable here: ProcessingTimeTimeout keeps the query
    // triggering timeout batches, so it never quiesces (see sessionize
    // above) — poll the sink instead. Micro-batch boundaries between the
    // variants are best-effort; pair discovery is arrival-order-proof.
    for (v <- 0 until 3) {
      in.addData(corpus.filter(_._1 % 10 == v))
      Thread.sleep(200)
    }
    def streamed(): Set[(Long, Long, Double)] = pairSet(spark.table("sndeq")
      .select("a", "b", "jaccard").as[(Long, Long, Double)]
      .collect().toSeq)
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (streamed() != batch && System.nanoTime() < deadline)
      Thread.sleep(500)
    // identical band constants → identical candidate sets; identical
    // integer intersect counts → bit-identical jaccard
    assert(streamed() == batch, s"stream=${streamed()} batch=$batch")
    assert(batch.nonEmpty && batch.exists(_._3 < 1.0)) // both kinds present
    q.stop()
  }

  test("writeDayFiles: one file per epoch day, mtime order = day order, " +
    "equal timestamps never split") {
    import spark.implicits._
    // three days; day 2 has two rows sharing one exact timestamp — the
    // pair a batch cut must never separate (the replay parity invariant)
    val rows = Seq(
      (1L, ts("2024-01-01 23:59:59"), "view"),
      (2L, ts("2024-01-02 00:00:00"), "view"),
      (3L, ts("2024-01-02 12:00:00"), "click"),
      (4L, ts("2024-01-02 12:00:00"), "view"),
      (5L, ts("2024-01-03 00:00:01"), "click"))
    val slice = rows.toDF("event_id", "ts", "event_type")
    val dir = graft.streaming.ReplayParity.writeDayFiles(slice)
    try {
      val files = new java.io.File(dir.toUri.getPath).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .sortBy(_.lastModified())
      assert(files.length == 3) // one file per day present in the slice
      // mtimes strictly increasing (the file source's processing order)
      assert(files.sliding(2).forall(p =>
        p(0).lastModified() < p(1).lastModified()))
      val perFile = files.map { f =>
        spark.read.parquet(f.getAbsolutePath)
          .select(col("event_id"),
            org.apache.spark.sql.functions.expr(
              "unix_micros(ts) div 86400000000").as("day"))
          .as[(Long, Long)].collect().toSeq
      }
      // every file holds exactly one epoch day; mtime order is day order
      val daysPerFile = perFile.map(_.map(_._2).distinct).toSeq
      assert(daysPerFile.forall(_.size == 1))
      assert(daysPerFile.map(_.head) == daysPerFile.map(_.head).sorted)
      // no row lost, and the equal-ts pair (3, 4) shares one file
      assert(perFile.flatten.map(_._1).sorted.toSeq == (1L to 5L))
      val fileOf = perFile.zipWithIndex.flatMap { case (rs, i) =>
        rs.map(r => r._1 -> i)
      }.toMap
      assert(fileOf(3L) == fileOf(4L))
    } finally {
      val d = new java.io.File(dir.toUri.getPath)
      d.listFiles().foreach(_.delete()); d.delete()
    }
  }

  test("file-backed replay: streamingAsOf over day files equals the " +
    "MemoryStream-fed answer (cross-day state)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.streaming.EventStreams.TypedEvent
    // view on day 1 attributes a click on day 2 — state must cross the
    // file-per-day micro-batch boundary exactly as it crossed addData
    // batches in the MemoryStream spec above
    val events = Seq(
      TypedEvent(1L, 9L, ts("2024-02-01 10:00:00"), "view"),
      TypedEvent(2L, 9L, ts("2024-02-02 10:00:00"), "click"),
      TypedEvent(3L, 5L, ts("2024-02-02 09:00:00"), "click"))
    val dir = graft.streaming.ReplayParity.writeDayFiles(
      events.toDF().select(col("event_id"), col("user_id"), col("ts"),
        col("event_type")))
    spark.catalog.dropTempView("g_filereplay_t")
    try {
      val in = spark.readStream
        .schema(events.toDF().schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir.toString)
      val q = EventStreams.streamingAsOf(in.as[TypedEvent]).writeStream
        .format("memory").queryName("g_filereplay_t")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val out = spark.table("g_filereplay_t")
        .as[(Long, Long, Option[Long], Option[Long])].collect()
        .map(r => r._1 -> (r._3, r._4)).toMap
      assert(out(2L) == (Some(1L), Some(86400L * 1000000))) // cross-day
      assert(out(3L) == (None, None)) // other user, no view
    } finally {
      spark.sql("DROP TABLE IF EXISTS g_filereplay_t")
      val d = new java.io.File(dir.toUri.getPath)
      d.listFiles().foreach(_.delete()); d.delete()
    }
  }

  test("late replay: Spark's two-watermark rule — one-day-late rows " +
    "merge, two-day-late rows drop, no window emits twice") {
    import spark.implicits._
    def t(day: Int, hour: Int, min: Int) = new Timestamp(
      1704067200000L + (day.toLong * 86400 + hour * 3600 + min * 60) * 1000L)
    // event_id % 10 == 5 → one day late; % 10 == 0 → two days late
    // (ReplayParity.lateShiftedDay's permutation). The two-day-late row
    // 20 targets window [01:00, 02:00) of day 0, which batch 2's late
    // filter (watermark from TWO batches back = day-0 max 23:30 − 1 h)
    // rejects; the one-day-late row 5 targets [03:00, 04:00) — its
    // filter watermark is still epoch 0 when day 1's batch runs, so it
    // merges even though that window is long past the EVICTION
    // watermark; late row 15 from day 0's last hour also merges.
    val rows = Seq(
      (1L, t(0, 1, 0), "view", 1.0),
      (2L, t(0, 23, 30), "view", 1.0),  // day-0 max event time
      (5L, t(0, 3, 0), "view", 1.0),    // 1 day late: KEPT
      (15L, t(0, 23, 15), "view", 1.0), // 1 day late, last hour: KEPT
      (3L, t(1, 1, 0), "view", 1.0),
      (20L, t(0, 1, 30), "view", 1.0),  // 2 days late: DROPPED
      (4L, t(2, 1, 0), "view", 1.0))
      .toDF("event_id", "ts", "event_type", "value")
    val maxMs = t(2, 1, 0).getTime
    val sent = Seq(
      (-1L, new Timestamp(maxMs + 86400000L), "_flush", 0.0),
      (-2L, new Timestamp(maxMs + 2 * 86400000L), "_flush", 0.0))
      .toDF("event_id", "ts", "event_type", "value")
    val dir = graft.streaming.ReplayParity.writeDayFiles(
      rows.unionByName(sent), graft.streaming.ReplayParity.lateShiftedDay)
    spark.catalog.dropTempView("g_latereplay_t")
    try {
      val in = spark.readStream.schema(rows.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir.toString)
      val q = EventStreams.windowedCounts(in).writeStream
        .format("memory").queryName("g_latereplay_t")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val out = spark.table("g_latereplay_t")
        .filter(col("event_type") =!= "_flush")
        .select(col("window_start").cast("string"), col("n"))
        .as[(String, Long)].collect().toSeq.sorted
      assert(out == Seq(
        ("2024-01-01 01:00:00", 1L), // row 20 dropped — count stays 1
        ("2024-01-01 03:00:00", 1L), // row 5 merged despite closed window
        ("2024-01-01 23:00:00", 2L), // rows 2 + 15 (late) together
        ("2024-01-02 01:00:00", 1L),
        ("2024-01-03 01:00:00", 1L)),
        s"two-watermark late semantics diverged: $out")
      // append-mode safety: no window emitted twice
      assert(out.map(_._1).distinct.size == out.size)
    } finally {
      spark.sql("DROP TABLE IF EXISTS g_latereplay_t")
      val d = new java.io.File(dir.toUri.getPath)
      d.listFiles().foreach(_.delete()); d.delete()
    }
  }

  test("late replay: a late click overtaken by a newer view reports " +
    "no match (bounded-state as-of contract)") {
    import spark.implicits._
    import graft.streaming.EventStreams.TypedEvent
    // click 10 (ts day0 12:00) arrives TWO days late (id % 10 == 0);
    // by then user 9's state holds view 3 from day 1 (newer than the
    // click) — the engine never attributes backwards, so the click
    // reports no match even though view 1 was its true batch answer.
    // Click 4 (on time, day 2) still matches the newest view 3.
    val events = Seq(
      TypedEvent(1L, 9L, ts("2024-03-01 10:00:00"), "view"),
      TypedEvent(10L, 9L, ts("2024-03-01 12:00:00"), "click"), // 2d late
      TypedEvent(3L, 9L, ts("2024-03-02 10:00:00"), "view"),
      TypedEvent(4L, 9L, ts("2024-03-03 09:00:00"), "click"))
    val dir = graft.streaming.ReplayParity.writeDayFiles(
      events.toDF().select(col("event_id"), col("user_id"), col("ts"),
        col("event_type")),
      graft.streaming.ReplayParity.lateShiftedDay)
    spark.catalog.dropTempView("g_lateasof_t")
    try {
      val in = spark.readStream.schema(events.toDF().schema)
        .option("maxFilesPerTrigger", 1).parquet(dir.toString)
      val q = EventStreams.streamingAsOf(in.as[TypedEvent]).writeStream
        .format("memory").queryName("g_lateasof_t")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val out = spark.table("g_lateasof_t")
        .as[(Long, Long, Option[Long], Option[Long])].collect()
        .map(r => r._1 -> r._3).toMap
      assert(out(10L).isEmpty, "late click must report no match")
      assert(out(4L).contains(3L), "on-time click matches newest view")
    } finally {
      spark.sql("DROP TABLE IF EXISTS g_lateasof_t")
      val d = new java.io.File(dir.toUri.getPath)
      d.listFiles().foreach(_.delete()); d.delete()
    }
  }
}
