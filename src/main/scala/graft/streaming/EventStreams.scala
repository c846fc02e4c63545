package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured-Streaming operators over the events stream shape
  * (event_id, ts, user_id, event_type, value): watermarked windowed
  * aggregation and custom per-key session state via mapGroupsWithState —
  * the streaming surface the engine exposes beyond the reference's
  * batch-only world.
  */
object EventStreams {

  /** Hourly event counts + value sums per type with a 1-hour watermark:
    * late events beyond the watermark are dropped, state is bounded.
    * `slide` < `window` makes the windows OVERLAP (each event lands in
    * window/slide of them) — the rate-monitoring shape; the default
    * slide = window is tumbling.
    */
  def windowedCounts(events: DataFrame,
                     window: String = "1 hour",
                     watermark: String = "1 hour",
                     slide: Option[String] = None): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window,
        slide.getOrElse(window)),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Native EVENT-TIME session windows (`session_window` + watermark):
    * per-user sessions that close after `gapUs` microseconds of
    * inactivity, with Spark merging the per-batch partial windows in
    * the state store — the streaming twin of the batch
    * [[graft.operators.Temporal.gapSessionize]], whose gap rule is
    * "same session iff next − prev ≤ gapUs". `session_window` merges
    * windows that OVERLAP (next < prev + gap), so the gap passed to
    * Spark is gapUs + 1 µs — at microsecond timestamp resolution the
    * two rules are then identical, boundary case included.
    *
    * Append mode: a session row emits only when the event-time
    * watermark passes its end (last ts + gap), so late-merging can
    * never re-open an emitted session as long as real gaps stay under
    * the watermark delay. State per key is the open sessions only —
    * bounded by activity, never history.
    */
  def sessionWindows(events: DataFrame,
                     gapUs: Long = 4L * 3600 * 1000000,
                     watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"${gapUs + 1} microseconds"))
      .agg(count(lit(1)).as("n_events"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .as("dur_us"),
        min(col("event_id")).as("min_event_id"),
        max(col("event_id")).as("max_event_id"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), col("dur_us"),
        col("min_event_id"), col("max_event_id"))

  /** STREAM-STREAM interval join: every (click, view) pair by the same
    * user with the view inside the hour before the click — the
    * continuous form of the batch range join (q87's shape), and the one
    * structured-streaming join kind with two buffered sides. Both sides
    * derive from ONE event stream (a supported self-join): each carries
    * its own watermark, and the join condition's time bounds let Spark
    * derive state retention — a view is dropped once the watermark
    * passes view_ts + `window`, a click once it passes click_ts, so
    * state is (arrival rate × window), never history. INNER join:
    * matches emit as soon as both sides have arrived — no flush
    * sentinel needed for completeness, unlike the windowed aggregates.
    */
  def streamingIntervalJoin(events: DataFrame,
                            window: String = "1 hour",
                            watermark: String = "1 hour"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"),
        col("user_id").as("v_user"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    clicks.join(views, expr(
      s"""c_user = v_user AND
         |view_ts >= click_ts - interval $window AND
         |view_ts <= click_ts""".stripMargin))
      .select(col("click_id"), col("view_id"), col("c_user").as("user_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
          .as("lag_us"))
  }

  /** Streaming exact dedup with BOUNDED state: the batch content-hash
    * dedup (TextOps.exactDedup) re-expressed for a continuous ingest
    * feed. `dropDuplicatesWithinWatermark` keeps a key's state only
    * until the watermark passes it, so state size is (arrival rate ×
    * watermark window), not corpus size — the only dedup shape that
    * survives an unbounded 100 TB/day stream. Exactly-once per key
    * within the window; a re-crawl after the window re-emits (matching
    * the reference's monthly re-scrape semantics, where a month-later
    * snapshot is a new observation, not a dup).
    *
    * Null text (scrape/decode failures) must NOT collapse: md5(null) is
    * null and dropDuplicates treats null as one key, which would silently
    * discard all but one failed doc per window — so null-text rows hash
    * to a per-doc surrogate and always pass through, matching batch
    * exactDedup's keep-every-row posture.
    */
  def streamingDedup(docs: DataFrame, idCol: String = "doc_id",
                     tsCol: String = "ts", textCol: String = "text",
                     watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash",
        coalesce(md5(col(textCol)),
          concat(lit(" null:"), col(idCol).cast("string"))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  case class BucketDoc(doc_id: Long, shset: Array[Long])
  case class BucketState(docs: List[BucketDoc])
  case class DupPair(a: Long, b: Long, jaccard: Double, band: Int)
  case class TsDupPair(a: Long, b: Long, jaccard: Double, band: Int,
                       ts: Timestamp)

  /** Streaming MinHash-LSH NEAR-dup — the streaming form of the batch
    * [[graft.operators.TextOps.lshVerifiedPairs]] flagship: incoming
    * docs compute the SAME row-local hashed-shingle-set → signature →
    * band keys (identical constants, so batch and stream agree on which
    * docs collide); each (band, key) bucket holds up to `maxPerBucket`
    * recent doc shingle sets as flatMapGroupsWithState state, and every
    * arrival is exact-Jaccard verified against its bucket peers,
    * emitting (a, b, jaccard, band) for matches ≥ `threshold`.
    *
    * Semantics, stated honestly: output is exactly-once per (pair,
    * band) but at-least-once per PAIR — a pair whose docs collide in
    * two bands emits from both bucket groups (the batch path's
    * `.distinct()` needs a second stateful stage in a stream). The
    * engine's duplicate-pair sink is key-constrained
    * (Sinks.constrainedAppend), so multi-emission is idempotent where
    * it lands; callers that need unique pairs in-stream use
    * [[streamingNearDupUnique]], which chains the pair-keyed
    * `dropDuplicatesWithinWatermark` stage.
    *
    * 100 TB posture: state per bucket is capped (`maxPerBucket` oldest
    * evicted first) and buckets idle past `stateTtlMs` are removed via
    * ProcessingTimeTimeout — state is bounded by (active buckets ×
    * maxPerBucket × shingle-set size) regardless of stream length,
    * the same memory law as the batch path's band-bucket sparsity.
    */
  def streamingNearDup(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text",
                       threshold: Double = 0.8,
                       maxPerBucket: Int = 64,
                       stateTtlMs: Long = 3600000L): Dataset[DupPair] = {
    import docs.sparkSession.implicits._
    nearDupPairs(docs, idCol, lit(0L).cast("timestamp"), textCol,
      threshold, maxPerBucket, stateTtlMs)
      .select(col("a"), col("b"), col("jaccard"), col("band"))
      .as[DupPair]
  }

  /** [[streamingNearDup]] composed with in-stream pair uniqueness:
    * exactly-once per PAIR across bands AND across micro-batches within
    * `pairWatermark`. The second stateful stage keys
    * `dropDuplicatesWithinWatermark` on (a, b); a pair's event time is
    * the ARRIVING doc's `tsCol` (its discovery time), so pair-dedup
    * state is bounded by (pair discovery rate × watermark window) —
    * the same state law as [[streamingDedup]]. A pair re-discovered
    * after the watermark re-emits, matching the re-scrape-is-a-new-
    * observation posture. Chaining two stateful operators in append
    * mode is the Spark 3.4+ multi-stateful-operator shape; the pair's
    * own watermark is defined downstream of the bucket stage so the
    * dedup state purges on pair event time, not bucket state time.
    * Corollary (spec-pinned): the pair watermark only ADVANCES while
    * pairs flow — a quiet pair stream leaves dedup entries in state
    * until the next pair batch, which bounds state by pair throughput
    * (the steady state of a production near-dup feed), not wall time.
    */
  def streamingNearDupUnique(docs: DataFrame, idCol: String = "doc_id",
                             tsCol: String = "ts",
                             textCol: String = "text",
                             threshold: Double = 0.8,
                             maxPerBucket: Int = 64,
                             stateTtlMs: Long = 3600000L,
                             pairWatermark: String = "1 hour")
      : Dataset[DupPair] = {
    import docs.sparkSession.implicits._
    nearDupPairs(docs, idCol, col(tsCol), textCol,
      threshold, maxPerBucket, stateTtlMs)
      .withWatermark("ts", pairWatermark)
      .dropDuplicatesWithinWatermark("a", "b")
      .select(col("a"), col("b"), col("jaccard"), col("band"))
      .as[DupPair]
  }

  /** Shared banding + bucket-state core: row-local hashed-shingle-set →
    * signature → band keys (constants shared with the batch path), then
    * per-(band, key) exact-Jaccard verify against held peers. Emits
    * `ts` = the arriving doc's event time so downstream stages can
    * watermark on pair discovery time.
    */
  private def nearDupPairs(docs: DataFrame, idCol: String,
                           tsExpr: org.apache.spark.sql.Column,
                           textCol: String, threshold: Double,
                           maxPerBucket: Int,
                           stateTtlMs: Long): Dataset[TsDupPair] = {
    import docs.sparkSession.implicits._
    import graft.TextOps
    val sig = docs.select(col(idCol).as("doc_id"), tsExpr.as("ts"),
        TextOps.hashedShingleSet(col(textCol)).as("shset"))
      .select(col("doc_id") +: col("ts") +: col("shset") +:
        TextOps.sigCols(col("shset")): _*)
    val banded = sig.select(col("doc_id"), col("ts"), col("shset"),
        explode(array((0 until TextOps.bandsCount).map { j =>
          struct(lit(j).as("band"),
            (col(s"sig${2 * j}") * TextOps.P + col(s"sig${2 * j + 1}"))
              .as("key"))
        }: _*)).as("bk"))
      .select(col("doc_id"), col("ts"), col("shset"),
        col("bk.band"), col("bk.key"))
      .filter(col("key").isNotNull)
      .as[(Long, Timestamp, Array[Long], Int, Long)]
    banded
      .groupByKey { case (_, _, _, band, key) => (band, key) }
      .flatMapGroupsWithState[BucketState, TsDupPair](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout) {
        case ((band, _), rows, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // doc_id order makes the emitted pair set independent of
            // micro-batch-internal row order
            val arrivals = rows.toSeq.sortBy(_._1)
            var held = state.getOption.map(_.docs).getOrElse(Nil)
            val out = Seq.newBuilder[TsDupPair]
            for ((id, ts, shset, _, _) <- arrivals) {
              for (peer <- held if peer.doc_id != id) {
                val inter = sortedIntersectCount(peer.shset, shset)
                val union = peer.shset.length + shset.length - inter
                val j = if (union == 0) 0.0 else inter.toDouble / union
                if (j >= threshold)
                  out += TsDupPair(math.min(peer.doc_id, id),
                    math.max(peer.doc_id, id), j, band, ts)
              }
              // a re-delivered doc_id REPLACES its old entry (never
              // appends a second copy): otherwise a later peer emits the
              // same (pair, band) once per stale copy and an UPDATED
              // document's old shingle set keeps matching
              held = (held.filterNot(_.doc_id == id) :+ BucketDoc(id, shset))
                .takeRight(maxPerBucket)
            }
            state.update(BucketState(held))
            state.setTimeoutDuration(stateTtlMs)
            out.result().iterator
          }
      }
  }

  /** Two-pointer intersect over sorted long arrays — the plain-Scala
    * twin of the native `graft_sorted_intersect_count` kernel, for use
    * inside state functions (already imperative per-group land).
    */
  private def sortedIntersectCount(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { n += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    n
  }

  case class TypedEvent(event_id: Long, user_id: Long, ts: Timestamp,
                        event_type: String)
  case class AsOfState(view_id: Long, view_ts_us: Long)
  case class Attribution(click_id: Long, user_id: Long,
                         view_id: Option[Long], lag_us: Option[Long])

  /** Streaming AS-OF: the continuous twin of the batch
    * [[graft.Temporal.asOfJoin]] (q79) — each click is attributed to
    * the latest view by the same user at-or-before it, from per-user
    * state that holds ONLY the newest view seen (one tiny record per
    * user, not history — the bound that survives an unbounded stream).
    * Within a micro-batch events are processed in (ts, side, event_id)
    * order — views before clicks at equal ts, the batch form's
    * (_ts, _side, _tie) sort — so a click sees a same-batch earlier OR
    * same-timestamp view regardless of event-id order.
    *
    * Bounded-state semantics, documented not hidden: a click that
    * arrives AFTER a newer view has already replaced its true match
    * reports no match (the state's view is newer than the click — we
    * never attribute backwards in time), and processing is
    * at-least-once per micro-batch. The batch q79 over the same events
    * is the exact retrospective answer; this operator is the low-latency
    * approximation whose error is confined to out-of-order arrivals.
    *
    * Tied view timestamps resolve exactly like the batch form's
    * `rightTie`: the max event_id among equal-ts views wins, REGARDLESS
    * of which micro-batch each tied view arrived in — a tied view only
    * replaces held state when its id is larger, so arrival order can't
    * leak into the attribution.
    */
  def streamingAsOf(events: Dataset[TypedEvent],
                    rightType: String = "view",
                    leftType: String = "click"): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    def us(t: Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfState, Attribution](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[AsOfState]) =>
          // (ts, side, id) — the batch asOfJoin's (_ts, _side, _tie)
          // sort: at equal ts every view processes BEFORE any click, so
          // a same-batch tied click sees the view (>= tie semantics)
          // even when the view's event_id is larger than the click's
          val ordered = rows.toSeq.sortBy(e =>
            (us(e.ts), if (e.event_type == rightType) 0 else 1, e.event_id))
          var st = state.getOption
          val out = Seq.newBuilder[Attribution]
          ordered.foreach { e =>
            val tUs = us(e.ts)
            if (e.event_type == rightType) {
              if (st.forall(s => s.view_ts_us < tUs ||
                  (s.view_ts_us == tUs && s.view_id < e.event_id)))
                st = Some(AsOfState(e.event_id, tUs))
            } else if (e.event_type == leftType) {
              val m = st.filter(_.view_ts_us <= tUs)
              out += Attribution(e.event_id, userId, m.map(_.view_id),
                m.map(s => tUs - s.view_ts_us))
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }

  case class Event(user_id: Long, ts: Timestamp, event_type: String)
  case class SessionState(n: Long, lastTs: Long)
  case class UserSession(user_id: Long, n_events: Long, closed: Boolean)

  /** Per-user sessionization with processing-time timeout: counts events
    * per user, emits the running session on every batch and a closed
    * session when the key times out. KeyValueGroupedDataset +
    * mapGroupsWithState — the custom-state shape the built-in windowed
    * aggs can't express.
    */
  def sessionize(events: Dataset[Event],
                 timeoutMs: Long = 60000): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSession](
        GroupStateTimeout.ProcessingTimeTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            UserSession(userId, s.n, closed = true)
          } else {
            val events = rows.toSeq
            val prev = state.getOption.getOrElse(SessionState(0L, 0L))
            val next = SessionState(prev.n + events.size,
              math.max(prev.lastTs, events.map(_.ts.getTime).max))
            state.update(next)
            state.setTimeoutDuration(timeoutMs)
            UserSession(userId, next.n, closed = false)
          }
      }
  }
}
