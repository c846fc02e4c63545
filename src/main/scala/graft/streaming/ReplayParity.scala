package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Batch-replay PARITY harness: drives the [[EventStreams]] operators
  * over a bounded, time-ordered replay of the events table and returns
  * the accumulated results — registered as q100/q106/q112/q113 with
  * their batch twins' oracles, so the driver's correctness gate covers
  * each streaming operator end-to-end (state crossing real micro-batch
  * boundaries), not just the unit specs.
  *
  * Replay discipline: events feed in epoch-day micro-batches in
  * ascending day order. Day cuts never split equal timestamps, and
  * ts-ordered arrival is what makes each operator's streamed answer
  * EXACTLY its retrospective batch answer (per-operator argument at
  * each entry point below).
  *
  * The feed is FILE-BACKED and collect-free: the replay slice is
  * written as one parquet file per epoch day (an executor-side
  * `partitionBy` write — [[writeDayFiles]]), then a file stream with
  * `maxFilesPerTrigger=1` turns each day file into one micro-batch.
  * File order is pinned by strictly increasing modification times in
  * day order (the file source processes oldest-first), so batch cuts
  * are exactly the day cuts — deterministic, no driver-side buffering
  * of event rows. The only driver-side values are the bounded day
  * LISTING (≤ |calendar days| entries, independent of event volume)
  * and, for the windowed gates, one max-timestamp scalar for the flush
  * sentinels. A production deployment points the identical operator at
  * a real file/Kafka feed; this harness only pins the batch boundaries
  * the parity argument needs.
  */
object ReplayParity {

  /** Fixed past base for replay-file modification times: the file
    * source orders by mtime (oldest first), so day index i gets
    * BASE + 2i seconds — strictly increasing, comfortably inside the
    * source's maxFileAge window relative to the newest file.
    */
  private val MtimeBaseMs = 1700000000000L

  /** The default ARRIVAL day: the event's own ts epoch-day — arrival
    * order equals event-time order, the no-late precondition of the
    * q100/q106/q112/q113 parity gates. The late-data gates (q131/q132)
    * pass [[lateShiftedDay]] instead.
    */
  private[graft] def tsDay: org.apache.spark.sql.Column =
    expr("unix_micros(ts) div 86400000000")

  /** Arrival day with PLANTED LATE EVENTS: every fifth event_id is
    * late (sentinels excluded — they must stay the final batches), in
    * two severities chosen around Spark's two-watermark rule so BOTH
    * outcomes occur: `event_id % 10 == 5` arrives ONE day late (always
    * survives the late filter — the filter watermark lags a full batch
    * behind eviction, see q131's scaladoc) and `event_id % 10 == 0`
    * arrives TWO days late (drops unless its window sits in the last
    * watermark-delay sliver of its day). The moduli are the gates'
    * determinism contract: the DuckDB oracles re-derive the same
    * permutation, so engine and oracle agree on which rows are late —
    * edit both together.
    */
  private[graft] def lateShiftedDay: org.apache.spark.sql.Column =
    tsDay + when(col("event_type") === "_flush", lit(0L))
      .when(pmod(col("event_id"), lit(10)) === 0, lit(2L))
      .when(pmod(col("event_id"), lit(10)) === 5, lit(1L))
      .otherwise(lit(0L))

  /** Write `slice` as ONE parquet file per ARRIVAL day (`dayExpr`,
    * default the ts epoch-day) into a fresh directory, mtimes
    * ascending in day order; returns the replay directory.
    * Executor-side: `repartition(day)` lands each day in exactly one
    * task, `partitionBy(day)` gives it one file; the driver only
    * renames the bounded day listing into place. Under the default
    * dayExpr equal timestamps share an epoch day by construction, so
    * no file split — hence no micro-batch cut — can separate them
    * (EventStreamsSpec pins this invariant); the late-data gates
    * deliberately break arrival-equals-event-time with
    * [[lateShiftedDay]] and model the consequences in their oracles.
    */
  /** Replay working area + its FileSystem — ALL file manipulation in
    * this harness goes through the Hadoop FileSystem API (list,
    * rename, setTimes, delete), so pointing `graft.replay.baseDir` at
    * an hdfs:// URI runs the identical gates against a remote store;
    * nothing here touches java.io. The default stays the local tmp
    * dir. Caveat, stated honestly: the file SOURCE orders batches by
    * modification time, and mtime pinning needs a store that
    * implements setTimes (local FS and HDFS do; S3A does not — an
    * object-store replay would pre-generate the day files with
    * naturally ascending timestamps instead).
    */
  private def workArea(s: SparkSession): (FileSystem, Path) = {
    val base = new Path(s.conf.get("graft.replay.baseDir",
      System.getProperty("java.io.tmpdir")))
    (base.getFileSystem(s.sessionState.newHadoopConf()), base)
  }

  private[graft] def writeDayFiles(slice: DataFrame,
      dayExpr: org.apache.spark.sql.Column = tsDay): Path = {
    val (fs, base) = workArea(slice.sparkSession)
    val tag = java.util.UUID.randomUUID().toString.take(12)
    val replayDir = new Path(base, s"graft_replay_$tag")
    val stage = new Path(base, s"graft_replay_stage_$tag")
    require(fs.mkdirs(replayDir), s"could not create $replayDir")
    try {
      slice
        // integer epoch/arrival day (Column `/` would be double division)
        .withColumn("g_day", dayExpr)
        .repartition(col("g_day"))
        .write.partitionBy("g_day").mode("overwrite")
        .parquet(stage.toString)
      val dayDirs = fs.listStatus(stage)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("g_day="))
        .sortBy(_.getPath.getName.stripPrefix("g_day=").toLong)
      dayDirs.zipWithIndex.foreach { case (dir, i) =>
        val parts = fs.listStatus(dir.getPath).map(_.getPath).filter(p =>
          p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
        require(parts.length == 1,
          s"expected one file per day, got ${parts.length} in ${dir.getPath}")
        val dest = new Path(replayDir, f"d$i%06d.parquet")
        require(fs.rename(parts.head, dest), s"could not move to $dest")
        fs.setTimes(dest, MtimeBaseMs + i * 2000L, -1)
      }
    } finally fs.delete(stage, true)
    replayDir
  }

  /** Run one file-backed replay: write the day files, drive `build`'s
    * streaming transform over a `maxFilesPerTrigger=1` file source
    * (one micro-batch per day file), accumulate into a memory sink,
    * and return the sink table. The replay directory is deleted after
    * the stream stops — the memory sink owns the result.
    */
  private def replayThroughFiles(s: SparkSession, slice: DataFrame,
                                 sinkName: String,
                                 build: DataFrame => DataFrame,
                                 dayExpr: org.apache.spark.sql.Column = tsDay)
      : DataFrame = {
    s.catalog.dropTempView(sinkName)
    val replayDir = writeDayFiles(slice, dayExpr)
    try {
      val in = s.readStream.schema(slice.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replayDir.toString)
      val q = build(in).writeStream
        .format("memory").queryName(sinkName).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    } finally workArea(s)._1.delete(replayDir, true)
    s.table(sinkName)
  }

  /** q100: [[EventStreams.streamingAsOf]] over the replay. Parity
    * argument: day cuts never split equal timestamps, and ts-ordered
    * arrival means no click processes after a NEWER view has replaced
    * its true match — the two conditions under which the bounded-state
    * streaming attribution is EXACTLY the retrospective batch answer
    * (see streamingAsOf's approximation contract), hence bit-equality
    * with q79.
    */
  def q100StreamingAsOfReplay(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val slice = Tables.events(s, d)
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    replayThroughFiles(s, slice, "g_q100_replay",
      in => EventStreams.streamingAsOf(
        in.as[EventStreams.TypedEvent]).toDF())
      .select(col("click_id"), col("user_id"), col("view_id"),
        col("lag_us"))
      .orderBy("click_id")
  }

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
    * triggers the emission pass. The sentinels ride the SAME day-file
    * mechanism: their timestamps are max(ts) + 1/2 days, so they land
    * in their own (later) day files and replay as their own final
    * micro-batches. Sentinel windows themselves never close (nothing
    * later raises the watermark past them) and are filtered by type as
    * a second guard.
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

  /** q152: [[EventStreams.sessionWindows]] driven through the epoch-day
    * replay — native `session_window` state merging across real
    * micro-batch boundaries, gated bit-equal to the batch
    * [[graft.operators.Temporal.gapSessionize]] (q80's oracle,
    * verbatim). Parity argument: under ts-ordered day-ascending
    * arrival no event is late, a session's end (last ts + gap) always
    * sits ahead of the watermark carried from previous days (so no
    * session finalizes while a same-user event inside the gap is still
    * coming — any such event is at most 4 h newer, the watermark a full
    * day older), and the two `_flush` sentinels (user −1, max + 1/2
    * days) push the final watermark past every real session's end.
    * `session_seq` is re-derived on the finalized sink — sessions are
    * time-disjoint per user, so ranking their starts reproduces the
    * batch numbering exactly.
    */
  def q152StreamingSessionsReplay(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val slice = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"))
    val maxTsRow = slice.agg(max(col("ts"))).head()
    val withSentinels =
      if (maxTsRow.isNullAt(0)) slice
      else {
        val maxMs = maxTsRow.getTimestamp(0).getTime
        val sentinels = Seq(1, 2).map { k =>
          (-k.toLong, -1L,
            new java.sql.Timestamp(maxMs + k * 86400000L), "_flush")
        }.toDF("event_id", "user_id", "ts", "event_type")
        slice.unionByName(sentinels)
      }
    replayThroughFiles(s, withSentinels, "g_q152_replay",
      in => EventStreams.sessionWindows(in))
      .filter(col("user_id") >= 0)
      .withColumn("session_seq", row_number().over(
        Window.partitionBy("user_id").orderBy("session_start"))
        .cast("long"))
      .select(col("user_id"), col("session_seq"), col("n_events"),
        col("dur_us"), col("min_event_id"), col("max_event_id"))
      .orderBy("user_id", "session_seq")
  }

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
    val slice = Tables.events(s, d)
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    replayThroughFiles(s, slice, "g_q113_replay",
      in => EventStreams.streamingIntervalJoin(in))
      .select(col("click_id"), col("view_id"), col("user_id"),
        col("lag_us"))
      .orderBy("click_id", "view_id")
  }

  /** q131: [[EventStreams.windowedCounts]] driven through a replay
    * that PLANTS LATE ARRIVALS — every fifth event_id arrives one day
    * after its event time ([[lateShiftedDay]]). This is the gate the
    * parity replays (q106/q112) cannot provide: their arrival orders
    * satisfy the no-late precondition by construction, so the
    * watermark's DROP contract — the part that actually bites in
    * production — was spec-only until this query.
    *
    * What the oracle re-derives (CorpusQueries q131): Spark's exact
    * TWO-WATERMARK late-row rule, probed empirically on 4.1.2 (the
    * multi-stateful-operator rework, SPARK-24634): EVICTION uses the
    * current batch's watermark (max event time over all prior batches
    * minus the 1 h delay — late rows count toward the max too, the
    * stats collector sits upstream of the stateful operator's filter),
    * while the LATE-EVENT filter uses the PREVIOUS batch's watermark.
    * So an input row is dropped iff its hour-window END ≤ the
    * watermark as of TWO batches back — one-day-late rows from day D
    * survive (the filter watermark lags inside day D−1 when their
    * batch processes) and merge into still-open or just-reopened
    * state, while two-days-late rows drop. The lag also guarantees a
    * window never emits twice: eviction leads the filter by exactly
    * one batch, so anything late enough to find its window evicted is
    * already filtered. The gated output exercises BOTH outcomes
    * (planted rows that survive AND a drop regime), which is what
    * makes this a real gate rather than an all-dropped/none-dropped
    * tautology.
    */
  def q131LateWindowsReplay(s: SparkSession, d: String): DataFrame =
    windowedReplay(s, d, slide = None, sinkName = "g_q131_replay",
      epochCol = "hour_epoch", dayExpr = lateShiftedDay)

  /** q132: [[EventStreams.streamingAsOf]] driven through the SAME
    * late-planted arrival permutation — gates the operator's
    * documented bounded-state approximation on out-of-order arrivals:
    * a click processed after a NEWER view replaced its true match
    * reports no match (state never attributes backwards in time).
    *
    * The oracle re-derives the state machine exactly: per-user state
    * after any set of processed views is their (ts, event_id) MAXIMUM
    * (replace-if-bigger over any order is order-independent), so each
    * click's held view is the max-(ts, id) view among views arrived
    * before it — cross-batch (earlier arrival day) or same-batch with
    * view_ts ≤ click_ts (the (ts, side, id) intra-batch sort processes
    * equal-ts views first). Match iff held.ts ≤ click.ts. Late VIEWS
    * produce misses (their clicks processed a batch earlier), late
    * CLICKS produce no-match rows where a newer view intervened —
    * both appear in the gated output.
    */
  def q132LateAsofReplay(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val slice = Tables.events(s, d)
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    replayThroughFiles(s, slice, "g_q132_replay",
      in => EventStreams.streamingAsOf(
        in.as[EventStreams.TypedEvent]).toDF(),
      dayExpr = lateShiftedDay)
      .select(col("click_id"), col("user_id"), col("view_id"),
        col("lag_us"))
      .orderBy("click_id")
  }

  /** q136: the standing dedup index's INGEST LOOP under streaming —
    * the composition the production story actually runs: a continuous
    * document feed arrives in micro-batches; each batch is SCREENED
    * against the standing index (the exact-hash arm), its verdicts
    * land in the result sink, and only then does the batch APPEND
    * into the index — so batch k's docs are known iff an
    * earlier-batch doc shares their hash, never a same-batch one.
    * All through the real streaming engine: a file-backed replay
    * (one synthetic epoch day per 100 doc_ids), foreachBatch +
    * Trigger.AvailableNow, executor-side parquet verdict sink —
    * no rows on the driver. The oracle re-derives the
    * screen-before-append law: canonical = min doc_id over
    * strictly-earlier batches sharing the hash.
    */
  def q136StreamingIndexIngest(s: SparkSession, d: String): DataFrame = {
    import graft.sources.DedupIndex
    // the corpus carries NO byte-identical texts at any SF, so without
    // augmentation the known/canonical path would never exercise —
    // plant deterministic cross-batch duplicates (every 17th doc takes
    // one of three seed texts; the oracle applies the SAME CASE — the
    // q101 shared-augmentation pattern, edit together)
    val text = when(pmod(col("doc_id"), lit(17)) === 3,
      concat(lit("dup-seed-"), pmod(col("doc_id"), lit(3))))
      .otherwise(col("text"))
    val slice = Tables.documents(s, d).select(col("doc_id"),
      expr("timestamp_seconds((doc_id div 100) * 86400)").as("ts"),
      text.as("text"))
    val replayDir = writeDayFiles(slice)
    val (fs, base) = workArea(s)
    val tag = java.util.UUID.randomUUID().toString.take(12)
    val outDir = new Path(base, s"graft_ingest_out_$tag")
    val ckpt = new Path(base, s"graft_ingest_ckpt_$tag")
    try {
      // bootstrap an EMPTY standing index — day one of the deployment
      DedupIndex.write(slice.limit(0), "doc_id", "text", "g136")
      val in = s.readStream.schema(slice.schema)
        .option("maxFilesPerTrigger", 1).parquet(replayDir.toString)
      val q = in.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          DedupIndex.screenExact(batch.sparkSession, batch,
            "doc_id", "text", "g136")
            .write.mode("append").parquet(outDir.toString)
          DedupIndex.append(batch, "doc_id", "text", "g136")
          graft.Caches.clear() // per-batch ingest projections
        }.start()
      q.awaitTermination()
      val result =
        if (fs.exists(outDir))
          s.read.parquet(outDir.toString)
            .select("doc_id", "content_hash", "canonical_id", "is_known")
            .orderBy("doc_id")
        else // empty corpus: no batch ever fired
          DedupIndex.screenExact(s, slice.limit(0), "doc_id", "text",
            "g136")
      // materialize executor-side BEFORE the sink dirs are reclaimed
      result.localCheckpoint(true)
    } finally {
      fs.delete(replayDir, true)
      fs.delete(outDir, true)
      fs.delete(ckpt, true)
    }
  }

  /** q190: the retrieval index's MAINTENANCE POLICY under streaming —
    * q136's ingest-loop posture with the r17 compaction policy in the
    * loop: documents arrive in doc_id-day micro-batches; each batch
    * APPENDS into the standing [[graft.sources.Bm25Index]], immediately
    * TAKES DOWN its rapid-retraction slice (doc_id % 10 == 6 — the
    * upload-then-delete shape moderation queues produce), then runs
    * [[graft.sources.Bm25Index.compactIfStale]]: the dead-row fraction
    * read from the stats log decides whether the rewrite is worth its
    * cost. The dynamics make BOTH outcomes structural, not staged: the
    * first batch lands at 20/110 ≈ 18% dead (≥ the 15% gate → FIRES),
    * compaction resets dead mass to zero, and the following batches
    * re-accumulate below the gate for several batches (10%, 12.9%,
    * 14.3% → SKIPS) before crossing again — the body asserts at least
    * one fire (and one skip when ≥ 2 batches ran), so a policy that
    * never evaluates cannot pass. The final search must answer exactly
    * as the inline ranker over the never-retracted corpus
    * (doc_id % 10 <> 6): compaction is semantics-free and the fold
    * discipline holds across every policy decision.
    */
  def q190StreamingIndexMaintenance(s: SparkSession, d: String,
      queries: Seq[(String, String)]): DataFrame = {
    import graft.sources.Bm25Index
    val slice = Tables.documents(s, d).select(col("doc_id"),
      expr("timestamp_seconds((doc_id div 100) * 86400)").as("ts"),
      col("text"))
    val replayDir = writeDayFiles(slice)
    val (fs, base) = workArea(s)
    val tag = java.util.UUID.randomUUID().toString.take(12)
    val ckpt = new Path(base, s"graft_maint_ckpt_$tag")
    try {
      // day-one bootstrap: an empty index
      Bm25Index.write(slice.limit(0).select("doc_id", "text"),
        "doc_id", "text", "g190")
      var fired = 0
      var skipped = 0
      var batches = 0
      val in = s.readStream.schema(slice.schema)
        .option("maxFilesPerTrigger", 1).parquet(replayDir.toString)
      val q = in.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val b = batch.select("doc_id", "text")
          Bm25Index.append(b, "doc_id", "text", "g190")
          Bm25Index.delete(b.filter(pmod(col("doc_id"), lit(10)) === 6),
            "doc_id", "text", "g190")
          if (Bm25Index.compactIfStale(batch.sparkSession, "g190",
            gatePct = 15L)) fired += 1
          else skipped += 1
          batches += 1
          graft.Caches.clear() // per-batch ingest projections
        }.start()
      q.awaitTermination()
      require(batches == 0 || fired >= 1,
        s"maintenance policy never fired across $batches batches")
      require(batches < 2 || skipped >= 1,
        s"maintenance policy never skipped across $batches batches")
      Bm25Index.search(s, "g190", queries)
    } finally {
      fs.delete(replayDir, true)
      fs.delete(ckpt, true)
    }
  }

  /** q161: the streaming SEMANTIC vector-ingest loop — q136's
    * screen-before-append discipline over the standing
    * [[graft.sources.VectorIndex]]: embeddings arrive in vec_id-day
    * micro-batches, each batch is screened for semantic duplicates
    * already live in the index (same block, integer-cosine ≥ 19/20),
    * then appended. The corpus's near-random embeddings never reach
    * the threshold, so cross-batch duplicates are PLANTED: every 17th
    * vector takes one of three seed embeddings (deterministic per-dim
    * formula, label untouched — the oracle applies the SAME CASE, edit
    * together). A vector is known iff a STRICTLY earlier batch holds a
    * same-block duplicate; canonical = min such vec_id; same-batch
    * duplicates stay unknown (the screen runs before the append).
    */
  def q161StreamingVectorIngest(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VectorIndex
    val seeded = transform(sequence(lit(0), lit(63)),
      dd => ((pmod(col("vec_id"), lit(3)) * 7 + dd * 13) % 201 - 100)
        .cast("double") / 100.0)
    val emb = when(pmod(col("vec_id"), lit(17)) === 3,
      seeded.cast("array<float>")).otherwise(col("embedding"))
    val slice = Tables.embeddings(s, d).select(col("vec_id"),
      emb.as("embedding"), col("label"))
    val replayDir = writeDayFiles(slice, expr("vec_id div 100"))
    val (fs, base) = workArea(s)
    val tag = java.util.UUID.randomUUID().toString.take(12)
    val outDir = new Path(base, s"graft_vecingest_out_$tag")
    val ckpt = new Path(base, s"graft_vecingest_ckpt_$tag")
    try {
      // bootstrap an EMPTY standing index — day one of the deployment
      VectorIndex.write(slice.limit(0), "vec_id", "embedding", "label",
        "g161")
      val in = s.readStream.schema(slice.schema)
        .option("maxFilesPerTrigger", 1).parquet(replayDir.toString)
      val q = in.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          VectorIndex.screenSemantic(batch.sparkSession, batch,
            "vec_id", "embedding", "label", "g161")
            .write.mode("append").parquet(outDir.toString)
          VectorIndex.append(batch, "vec_id", "embedding", "label",
            "g161")
          graft.Caches.clear() // per-batch ingest projections
        }.start()
      q.awaitTermination()
      val result =
        if (fs.exists(outDir))
          s.read.parquet(outDir.toString)
            .select("vec_id", "canonical_id", "is_known")
            .orderBy("vec_id")
        else // empty corpus: no batch ever fired
          VectorIndex.screenSemantic(s, slice.limit(0), "vec_id",
            "embedding", "label", "g161")
      // materialize executor-side BEFORE the sink dirs are reclaimed
      result.localCheckpoint(true)
    } finally {
      fs.delete(replayDir, true)
      fs.delete(outDir, true)
      fs.delete(ckpt, true)
    }
  }

  private def windowedReplay(s: SparkSession, d: String,
                             slide: Option[String], sinkName: String,
                             epochCol: String,
                             dayExpr: org.apache.spark.sql.Column = tsDay)
      : DataFrame = {
    import s.implicits._
    val slice = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    // one bounded driver scalar (the sentinel anchor) — the decontaminate
    // .head() posture, NOT a row collect; null on an empty table
    val maxTsRow = slice.agg(max(col("ts"))).head()
    val withSentinels =
      if (maxTsRow.isNullAt(0)) slice // empty replay: nothing to flush
      else {
        val maxMs = maxTsRow.getTimestamp(0).getTime
        // ts = max + k whole days ⇒ epoch-day = max's day + k exactly,
        // so each sentinel becomes its own final day file/micro-batch
        val sentinels = Seq(1, 2).map { k =>
          (-k.toLong, new java.sql.Timestamp(maxMs + k * 86400000L),
            "_flush", 0.0)
        }.toDF("event_id", "ts", "event_type", "value")
        slice.unionByName(sentinels)
      }
    replayThroughFiles(s, withSentinels, sinkName,
      in => EventStreams.windowedCounts(in, slide = slide), dayExpr)
      .filter(col("event_type") =!= "_flush")
      .select(unix_timestamp(col("window_start")).as(epochCol),
        col("event_type"), col("n"),
        (col("sum_value") * 100).cast("long").as("sum_cents"))
      .orderBy(epochCol, "event_type")
  }
}
