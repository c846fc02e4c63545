package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.Tables

/** Batch-replay PARITY harness: drives [[EventStreams.streamingAsOf]]
  * over a bounded, time-ordered replay of the events table and returns
  * the accumulated attributions — registered as q100 with q79's oracle,
  * so the driver's correctness gate covers the streaming operator
  * end-to-end (state crossing real micro-batch boundaries), not just
  * the unit specs.
  *
  * Replay discipline: click/view events feed in epoch-day micro-batches
  * in ascending day order. Day cuts never split equal timestamps, and
  * ts-ordered arrival means no click processes after a NEWER view has
  * replaced its true match — the two conditions under which the
  * bounded-state streaming attribution is EXACTLY the retrospective
  * batch answer (see [[EventStreams.streamingAsOf]]'s approximation
  * contract), hence bit-equality with q79.
  *
  * The driver-side feed (one bounded collect of the replay slice) is
  * the harness, not the operator: a production deployment reads a real
  * source (files/Kafka) through the identical operator and collects
  * nothing. MemoryStream is the only Spark source that lets a batch
  * gate control micro-batch boundaries deterministically.
  */
object ReplayParity {

  def q100StreamingAsOfReplay(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val sinkName = "g_q100_replay"
    s.catalog.dropTempView(sinkName)
    val replay = Tables.events(s, d)
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .as[EventStreams.TypedEvent].collect()
    // epoch-day cuts: timezone-free, ts-monotone, and equal timestamps
    // always land in one batch — the parity preconditions
    val byDay = replay.groupBy(_.ts.getTime / 86400000L).toSeq.sortBy(_._1)
    val in = MemoryStream[EventStreams.TypedEvent]
    val q = EventStreams.streamingAsOf(in.toDS()).writeStream
      .format("memory").queryName(sinkName).outputMode("append").start()
    try {
      byDay.foreach { case (_, batch) =>
        in.addData(batch.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    s.table(sinkName)
      .select(col("click_id"), col("user_id"), col("view_id"),
        col("lag_us"))
      .orderBy("click_id")
  }

  case class ValuedEvent(event_id: Long, ts: java.sql.Timestamp,
                         event_type: String, value: Double)

  /** q106: [[EventStreams.windowedCounts]] driven through the same
    * epoch-day replay — the watermark/append path crossing real
    * micro-batch boundaries, gated against the plain batch GROUP BY.
    *
    * Parity argument: day batches arrive in ascending ts order, so when
    * any batch processes, the watermark (previous day's max − 1 h) is
    * below every window that batch touches — no event is ever dropped
    * as late, and every hourly window eventually closes with its full
    * count, making the appended stream output exactly the batch
    * aggregate. Flushing needs TWO sentinel batches: watermark advances
    * from data seen in batch N only as of batch N+1, so sentinel 1
    * raises the watermark past the last real window and sentinel 2
    * triggers the emission pass. Sentinel windows themselves never
    * close (nothing later raises the watermark past them) and are
    * filtered by type as a second guard.
    *
    * `sum_cents`: the operator's DECIMAL(18,2) accumulator is exact and
    * order-independent; presenting it as integer cents sidesteps the
    * driver compare's decimal-vs-float rendering mismatch (the q02
    * moneySum discipline).
    */
  def q106StreamingWindowsReplay(s: SparkSession, d: String): DataFrame =
    windowedReplay(s, d, slide = None, sinkName = "g_q106_replay",
      epochCol = "hour_epoch")

  /** q112: the same replay through the SLIDING form (1 h window, 30 min
    * slide) — overlapping windows crossing real micro-batch/watermark
    * boundaries; parity with the batch two-windows-per-event oracle by
    * the same no-late-drop argument (every window containing an event
    * ends after the event's own ts, which is ahead of the watermark
    * carried from previous days).
    */
  def q112StreamingSlidingReplay(s: SparkSession, d: String): DataFrame =
    windowedReplay(s, d, slide = Some("30 minutes"),
      sinkName = "g_q112_replay", epochCol = "window_epoch")

  /** q113: [[EventStreams.streamingIntervalJoin]] driven through the
    * epoch-day replay — the stream-stream (two buffered sides) join
    * path, gated against the batch pair join. Parity: an INNER interval
    * join emits each matched pair in the micro-batch where its later
    * side arrives, and under day-ascending replay no needed state is
    * ever evicted early — a view needed by a day-D click has
    * view_ts ≥ D_start − window, while the watermark during day D's
    * batch is (day D−1 max − watermark) < D_start − window ≤
    * view_ts + window's retention deadline — so the streamed pair set
    * is EXACTLY the batch answer; no flush sentinels required.
    */
  def q113StreamingIntervalJoinReplay(s: SparkSession, d: String)
      : DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val sinkName = "g_q113_replay"
    s.catalog.dropTempView(sinkName)
    val replay = Tables.events(s, d)
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .as[EventStreams.TypedEvent].collect()
    val byDay = replay.groupBy(_.ts.getTime / 86400000L).toSeq.sortBy(_._1)
    val in = MemoryStream[EventStreams.TypedEvent]
    val q = EventStreams.streamingIntervalJoin(in.toDF()).writeStream
      .format("memory").queryName(sinkName).outputMode("append").start()
    try {
      byDay.foreach { case (_, batch) =>
        in.addData(batch.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    s.table(sinkName)
      .select(col("click_id"), col("view_id"), col("user_id"),
        col("lag_us"))
      .orderBy("click_id", "view_id")
  }

  private def windowedReplay(s: SparkSession, d: String,
                             slide: Option[String], sinkName: String,
                             epochCol: String): DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    s.catalog.dropTempView(sinkName)
    val replay = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .as[ValuedEvent].collect()
    if (replay.isEmpty)
      // match the batch twins' behavior on an empty table instead of
      // crashing on empty.max
      return s.emptyDataFrame
        .select(lit(0L).as(epochCol), lit("").as("event_type"),
          lit(0L).as("n"), lit(0L).as("sum_cents")).limit(0)
    val byDay = replay.groupBy(_.ts.getTime / 86400000L).toSeq.sortBy(_._1)
    val maxTs = replay.map(_.ts.getTime).max
    def sentinel(offsetDays: Int) = ValuedEvent(-offsetDays.toLong,
      new java.sql.Timestamp(maxTs + offsetDays * 86400000L), "_flush", 0.0)
    val in = MemoryStream[ValuedEvent]
    val q = EventStreams.windowedCounts(in.toDF(), slide = slide)
      .writeStream
      .format("memory").queryName(sinkName).outputMode("append").start()
    try {
      (byDay.map(_._2.toSeq) :+ Seq(sentinel(1)) :+ Seq(sentinel(2)))
        .foreach { batch =>
          in.addData(batch)
          q.processAllAvailable()
        }
    } finally q.stop()
    s.table(sinkName)
      .filter(col("event_type") =!= "_flush")
      .select(unix_timestamp(col("window_start")).as(epochCol),
        col("event_type"), col("n"),
        (col("sum_value") * 100).cast("long").as("sum_cents"))
      .orderBy(epochCol, "event_type")
  }
}
