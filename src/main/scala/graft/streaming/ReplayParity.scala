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
}
