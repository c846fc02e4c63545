package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators over event streams: as-of join (latest right row
  * at-or-before each left row's timestamp, per key) and gap-based
  * sessionization — the two canonical time-series shapes Spark has no
  * built-in operator for.
  *
  * Scale discipline: both are ONE shuffle on the entity key. The as-of
  * join is the union-tag + running-`last` form — never a range join
  * (whose candidate set explodes with time-window width) and never a
  * per-row lookup; sessionization is two window functions over the same
  * (key, time) sort, which Spark executes with a single exchange+sort.
  * At 100 TB both inherit AQE skew splitting on the key shuffle, and a
  * hot entity only concentrates its OWN rows, not a cross product.
  */
object Temporal {

  /** As-of join: for each `left` row, the single latest `right` row on
    * the same `keyCol` with `right.tsCol <= left.tsCol` (left-outer: no
    * prior right row → null struct). Implementation: tag both sides,
    * union, and take the running `last` non-null right payload over
    * (key, ts, side) — right sorts before left at equal ts, giving the
    * `>=` tie semantics of a native ASOF join. `leftCols` / `rightCols`
    * are the payload columns to carry; the matched right payload comes
    * back as one `asof` struct.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, leftCols: Seq[String],
               rightCols: Seq[String]): DataFrame =
    asOfJoin(left, right, keyCol, tsCol, tsCol, leftCols, rightCols)

  /** [[asOfJoin]] with distinct left/right timestamp columns — the form
    * a CHAINED as-of needs (step 2 anchors on step 1's matched ts). A
    * null left timestamp sorts before every right row and therefore
    * matches nothing (null-safe by the sort, not by a special case).
    *
    * `rightTie`: deterministic tiebreaker among right rows sharing
    * (key, ts) — the matched payload is the MAX-`rightTie` row (it
    * sorts last inside the tie, so the running `last` lands on it).
    * This mirrors "dedupe the right side to max-id per (key, ts)" in
    * an oracle, and matches [[graft.streaming.EventStreams
    * .streamingAsOf]], whose state replace at equal ts also keeps the
    * later event id. None leaves ties partition-order-dependent — only
    * safe when (key, ts) is unique on the right.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTs: String, rightTs: String, leftCols: Seq[String],
               rightCols: Seq[String],
               rightTie: Option[String] = None): DataFrame = {
    val l = left.select(col(keyCol).as("_k") +: col(leftTs).as("_ts") +:
      lit(1).as("_side") +: leftCols.map(c => col(c)): _*)
    val r = right.select(col(keyCol).as("_k"), col(rightTs).as("_ts"),
      lit(0).as("_side"), rightTie.map(col).getOrElse(lit(0L)).as("_tie"),
      struct(rightCols.map(col): _*).as("_r"))
    // left rows carry a null _tie via allowMissingColumns; _side already
    // orders them after every tied right row, so only right-vs-right
    // ties consult _tie
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++ Seq(col("_k").as(keyCol),
        col("_ts").as(leftTs), col("asof")): _*)
  }

  /** Gap sessionization: a new session starts when the same entity's
    * gap since its previous event exceeds `gapUs` microseconds. Output
    * is one row per session: event count, exact µs duration, and the
    * min/max event ids. `idCol` is the total-order tiebreaker so the
    * session boundaries are deterministic even at equal timestamps.
    */
  def gapSessionize(events: DataFrame, userCol: String, tsCol: String,
                    idCol: String, gapUs: Long): DataFrame = {
    val ord = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsCol), 1).over(ord)
    val fresh = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev) > gapUs, 1).otherwise(0)
    events
      .withColumn("session_seq", sum(fresh).over(run))
      .groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        (max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol))))
          .as("dur_us"),
        min(col(idCol)).as("min_event_id"),
        max(col(idCol)).as("max_event_id"))
      .orderBy(userCol, "session_seq")
  }

  /** Range (interval) join, binned: every `points` row paired with
    * every `intervals` row whose [startTs, endTs) half-open window
    * contains the point's timestamp (and whose `keyCols` match, when
    * given). Inner join; callers wanting left-outer semantics aggregate
    * the pairs and join back (see [[q87RangeWindows]]).
    *
    * Spark has no native range-join operator: a pure inequality join
    * condition falls back to BroadcastNestedLoopJoin (every point
    * checked against every interval — the quadratic cliff the asof-ab
    * probe measured at 139×). This is the standard bin-replication
    * rewrite: each interval is exploded onto the fixed-width µs bins it
    * covers, each point lands on its single bin, and the join becomes a
    * plain hash equi-join on (keyCols, bin) followed by the exact range
    * filter. Each matched pair materializes exactly once (the point has
    * ONE bin), so no dedup pass is needed.
    *
    * Scale shape: one hash shuffle per side on (keyCols, bin);
    * replication factor is ceil(len/binUs)+1 per interval, so pick
    * `binUs` near the typical interval length (replication ~2) — wider
    * bins trade replication for more false candidates in the filter.
    * Hot bins are ordinary shuffle skew, split by AQE; candidate count
    * tracks true temporal overlap, never |points|×|intervals|.
    *
    * Preconditions: `binUs > 0`; the two frames share no column names
    * outside `keyCols` (required, so the output can carry both sides'
    * payloads unprefixed); inverted/empty intervals (endTs <= startTs)
    * match nothing.
    */
  def rangeJoin(points: DataFrame, pointTs: String,
                intervals: DataFrame, startTs: String, endTs: String,
                binUs: Long, keyCols: Seq[String] = Nil): DataFrame = {
    require(binUs > 0, s"binUs must be positive, got $binUs")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keyCols
    require(overlap.isEmpty,
      s"points/intervals share non-key columns: ${overlap.mkString(", ")}")
    val iv = intervals.filter(col(endTs) > col(startTs))
      .withColumn("_bin", explode(sequence(
        expr(s"unix_micros($startTs) div ${binUs}L"),
        expr(s"(unix_micros($endTs) - 1) div ${binUs}L"))))
    points.withColumn("_bin", expr(s"unix_micros($pointTs) div ${binUs}L"))
      .join(iv, keyCols :+ "_bin")
      .filter(col(pointTs) >= col(startTs) && col(pointTs) < col(endTs))
      .drop("_bin")
  }

  /** Interval-OVERLAP join, binned: every `a` row paired with every
    * `b` row whose CLOSED interval [bStart, bEnd] intersects
    * [aStart, aEnd] (and whose `keyCols` match, when given). Closed
    * semantics so zero-length intervals (single-event sessions) still
    * overlap things that contain them. Inner join of both payloads,
    * like [[rangeJoin]].
    *
    * The interval×interval variant of [[rangeJoin]]'s bin rewrite:
    * both sides explode onto the fixed-width bins they cover, the join
    * is a hash equi-join on (keyCols, bin) + the exact overlap filter —
    * but two long intervals can share MANY bins, so each candidate
    * pair would surface once per shared bin. The standard dedup makes
    * the join emit each pair exactly once with NO distinct pass: a
    * pair's overlap starts at max(aStart, bStart), every shared bin is
    * at-or-after that bin, and the pair is kept only in that FIRST
    * shared bin (`_bin === greatest(...) div binUs`).
    *
    * Scale shape: identical to [[rangeJoin]] — one hash shuffle per
    * side on (keyCols, bin), replication ceil(len/binUs)+1 per row,
    * AQE splits hot bins, candidates track true overlap density. Same
    * preconditions: positive `binUs`, no non-key column collisions;
    * inverted intervals (end < start) match nothing.
    */
  def intervalOverlapJoin(a: DataFrame, aStart: String, aEnd: String,
                          b: DataFrame, bStart: String, bEnd: String,
                          binUs: Long,
                          keyCols: Seq[String] = Nil): DataFrame = {
    require(binUs > 0, s"binUs must be positive, got $binUs")
    val overlap = a.columns.toSet.intersect(b.columns.toSet) -- keyCols
    require(overlap.isEmpty,
      s"a/b share non-key columns: ${overlap.mkString(", ")}")
    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(e) >= col(s))
        .withColumn("_bin", explode(sequence(
          expr(s"unix_micros($s) div ${binUs}L"),
          expr(s"unix_micros($e) div ${binUs}L"))))
    binned(a, aStart, aEnd)
      .join(binned(b, bStart, bEnd), keyCols :+ "_bin")
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
        col("_bin") === expr(
          s"greatest(unix_micros($aStart), unix_micros($bStart)) " +
            s"div ${binUs}L"))
      .drop("_bin")
  }

  /** Click→view attribution: for each click, the latest view by the
    * same user at-or-before the click (the classic last-touch as-of
    * shape), with the exact µs lag. Left-outer: a click with no prior
    * view keeps nulls.
    */
  def q79ClickAttribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts"))
    asOfJoin(clicks, views, "user_id", "ts", "ts",
      Seq("click_id"), Seq("view_id", "ts"), rightTie = Some("view_id"))
      .select(col("click_id"), col("user_id"),
        col("asof.view_id").as("view_id"),
        (unix_micros(col("ts")) - unix_micros(col("asof.ts")))
          .as("lag_us"))
      .orderBy("click_id")
  }

  /** Per-user sessions at a 4-hour inactivity gap (the batch analog of
    * the streaming `EventStreams.sessionize`, here with an exact
    * DuckDB oracle).
    */
  def q80GapSessions(s: SparkSession, d: String): DataFrame =
    gapSessionize(Tables.events(s, d), "user_id", "ts", "event_id",
      4L * 3600 * 1000000)

  /** Retention cohorts: users grouped by their first-event DAY, then
    * distinct-user activity per (cohort, activity day) with the
    * retention rate against the cohort's size. JOIN-FREE: the cohort
    * label is a `min` window over the user's own partition, so the
    * whole matrix is one exchange on user_id plus an aggregate of
    * (days × days) cells — no self-join of events against firsts.
    * Day grain because the synthetic events span one month; the grain
    * is the `date_format` pattern, nothing structural.
    */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame =
    retentionMatrix(events, userCol, tsCol,
      countDistinct(col("user_id")))

  /** The shared cohort-matrix body behind [[retentionCohorts]] and
    * [[retentionCohortsApprox]] — one place for the labeling, grain,
    * and retention-rate definition; only the distinct-user aggregate
    * differs between the exact and sketch twins.
    */
  private def retentionMatrix(events: DataFrame, userCol: String,
                              tsCol: String,
                              nActive: Column): DataFrame = {
    val byUser = Window.partitionBy(userCol)
    val labeled = events.select(col(userCol).as("user_id"),
        date_format(col(tsCol), "yyyy-MM-dd").as("act_day"),
        date_format(min(col(tsCol)).over(byUser), "yyyy-MM-dd")
          .as("cohort"))
    val cells = labeled.groupBy("cohort", "act_day")
      .agg(nActive.as("n_active"))
    cells.withColumn("retention", round(col("n_active") /
        max(when(col("act_day") === col("cohort"), col("n_active")))
          .over(Window.partitionBy("cohort")), 6))
      .orderBy("cohort", "act_day")
  }

  /** q82: the daily retention matrix over the events table. */
  def q82Retention(s: SparkSession, d: String): DataFrame =
    retentionCohorts(Tables.events(s, d), "user_id", "ts")

  /** [[retentionCohorts]]'s 100 TB twin: the same matrix with
    * `approx_count_distinct` (HyperLogLog++, rsd 1%) in place of the
    * exact `countDistinct`. Exact distinct counting shuffles every
    * (cohort, day, user) triple into the aggregate's dedup state —
    * state ∝ distinct users per cell, the one unbounded aggregate left
    * in the extension set (VERDICT r10 §next-3). HLL sketches are
    * fixed-size and mergeable, so the map-side partial stays partial
    * and per-cell memory is constant at any user count. rsd trades
    * buffer size quadratically for accuracy: 0.5% costs 2^16 registers
    * per in-flight partial group and measured 4× slower than this
    * query at 1% (2^14) with no accuracy the bracket test can see —
    * don't tighten it below what the consumer reads. Sketch counts
    * are engine-specific → rows-only registry entry (no oracle);
    * ApproxTwinSpec brackets it against the exact q82.
    */
  def retentionCohortsApprox(events: DataFrame, userCol: String,
                             tsCol: String): DataFrame =
    retentionMatrix(events, userCol, tsCol,
      approx_count_distinct(col("user_id"), 0.01))

  /** q91: the approx retention matrix over the events table. */
  def q91RetentionApprox(s: SparkSession, d: String): DataFrame =
    retentionCohortsApprox(Tables.events(s, d), "user_id", "ts")

  /** The REGISTERED q91: [[q91RetentionApprox]] SELF-VALIDATED against
    * the exact matrix — same promotion as [[q86PercentilesGate]]: the
    * HLL++ counts can't hash-match an oracle, so the gate outputs the
    * exact cells (q82's oracle-checkable values) plus a per-cell
    * verdict that the sketch landed within ApproxTwinSpec's ±5%/±2
    * bound. [[retentionCohortsApprox]] stays the pure bounded-memory
    * form; the exact `countDistinct` here is gate-only cost.
    */
  def q91RetentionGate(s: SparkSession, d: String): DataFrame = {
    val ap = q91RetentionApprox(s, d)
      .select(col("cohort"), col("act_day"), col("n_active").as("n_approx"))
    q82Retention(s, d).join(ap, Seq("cohort", "act_day"))
      .select(col("cohort"), col("act_day"), col("n_active"),
        col("retention"),
        (abs(col("n_approx") - col("n_active")) <=
          greatest(lit(2.0), col("n_active") * 0.05)).as("approx_ok"))
      .orderBy("cohort", "act_day")
  }

  /** Funnel attribution: purchase → latest prior click → latest prior
    * view (anchored on the CLICK's time), per user, with exact µs lags
    * and a 7-day-per-step full-funnel verdict — two CHAINED as-of
    * joins, the second anchored on the first's matched timestamp. Still
    * just two hash shuffles on user_id; a purchase with no prior click
    * (or whose click has no prior view) keeps nulls and is counted out
    * of the funnel by the null-false coalesce.
    */
  def q83Funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    def typed(t: String, id: String) = ev.filter(col("event_type") === t)
      .select(col("event_id").as(id), col("user_id"), col("ts"))
    val week = 7L * 86400 * 1000000
    val pc = asOfJoin(typed("purchase", "purchase_id"),
        typed("click", "click_id"), "user_id", "ts", "ts",
        Seq("purchase_id"), Seq("click_id", "ts"),
        rightTie = Some("click_id"))
      .select(col("purchase_id"), col("user_id"), col("ts").as("p_ts"),
        col("asof.click_id").as("click_id"), col("asof.ts").as("c_ts"))
    asOfJoin(pc, typed("view", "view_id"), "user_id", "c_ts", "ts",
        Seq("purchase_id", "p_ts", "click_id"), Seq("view_id", "ts"),
        rightTie = Some("view_id"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts")))
          .as("click_lag_us"),
        col("asof.view_id").as("view_id"),
        (unix_micros(col("c_ts")) - unix_micros(col("asof.ts")))
          .as("view_lag_us"))
      .withColumn("full_funnel", coalesce(
        col("click_lag_us") <= week && col("view_lag_us") <= week,
        lit(false)))
      .orderBy("purchase_id")
  }

  /** Exact per-type value percentiles (linear interpolation over the
    * sorted group — the definition Spark's `percentile` and DuckDB's
    * `quantile_cont` share, which is what makes this oracle-able).
    * Exact percentiles materialize each group's values inside one
    * ordered aggregation buffer, so they're for BOUNDED groups — at
    * 100 TB an unbounded group switches to `approx_percentile`
    * (t-digest, mergeable, bounded memory), trading the oracle for
    * scale; this query is the exact form over the 5 event types, and
    * [[q86PercentilesApprox]] is that registered approx twin (rows-only
    * check — a sketch can't hash-match an oracle).
    */
  def q84Percentiles(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(percentile(col("value"), lit(0.5)), 6).as("p50"),
        round(percentile(col("value"), lit(0.9)), 6).as("p90"),
        round(percentile(col("value"), lit(0.99)), 6).as("p99"))
      .orderBy("event_type")

  /** [[q84Percentiles]]'s 100 TB twin: the same per-type value report
    * via `approx_percentile` — a mergeable quantile sketch with bounded
    * memory per group, the form an UNBOUNDED group requires (q84's
    * exact percentile materializes each group's values in one ordered
    * aggregation buffer). accuracy = 10000 → rank error ≤ 1/10000.
    * Sketch results are engine-specific, so this is a rows-only
    * registry entry (no oracle); q84 is the exact, oracle-gated form,
    * and ApproxTwinSpec pins the two within rank-error tolerance.
    */
  def q86PercentilesApprox(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(approx_percentile(col("value"), lit(0.5), lit(10000)), 6)
          .as("p50"),
        round(approx_percentile(col("value"), lit(0.9), lit(10000)), 6)
          .as("p90"),
        round(approx_percentile(col("value"), lit(0.99), lit(10000)), 6)
          .as("p99"))
      .orderBy("event_type")

  /** The REGISTERED q86: [[q86PercentilesApprox]] SELF-VALIDATED — the
    * sketch values are engine-specific (no DuckDB oracle can hash-match
    * a t-digest), so the gate query outputs what IS deterministic: the
    * exact ±1-percentile-rank bracket bounds (oracle-checkable via
    * `quantile_cont`) and a per-percentile verdict that the sketch
    * landed inside them — ApproxTwinSpec's bracket, promoted into the
    * driver artifact so q86 records a full rows+schema+hash pass
    * instead of a null `no_oracle` row (VERDICT r11 §missing-4). The
    * pure sketch form above stays the production/scale path; the exact
    * brackets here are gate-only cost over the 5 bounded groups.
    */
  def q86PercentilesGate(s: SparkSession, d: String): DataFrame = {
    val eps = 1e-6 // both sides round to 6 decimals
    val br = Tables.events(s, d).groupBy(col("event_type"))
      .agg(round(percentile(col("value"), lit(0.49)), 6).as("lo50"),
        round(percentile(col("value"), lit(0.51)), 6).as("hi50"),
        round(percentile(col("value"), lit(0.89)), 6).as("lo90"),
        round(percentile(col("value"), lit(0.91)), 6).as("hi90"),
        round(percentile(col("value"), lit(0.985)), 6).as("lo99"),
        round(percentile(col("value"), lit(0.995)), 6).as("hi99"))
    def ok(p: String, lo: String, hi: String): Column =
      (col(p) >= col(lo) - eps && col(p) <= col(hi) + eps).as(s"${p}_ok")
    q86PercentilesApprox(s, d).join(br, Seq("event_type"))
      .select(col("event_type"), col("n"),
        col("lo50"), col("hi50"), ok("p50", "lo50", "hi50"),
        col("lo90"), col("hi90"), ok("p90", "lo90", "hi90"),
        col("lo99"), col("hi99"), ok("p99", "lo99", "hi99"))
      .orderBy("event_type")
  }

  /** SCD2 (slowly-changing-dimension type 2) history build from an
    * observation stream — the warehouse layout the reference's monthly
    * listing snapshots want for "what was this listing's state over
    * time": consecutive observations of the same value collapse, each
    * VALUE CHANGE opens a versioned row with a [valid_from, valid_to)
    * interval, the last row per key stays open (`is_current`). Here the
    * observed attribute is each user's event_type stream; in the
    * listing pipeline it is price/status per url — same operator.
    *
    * Two windows on ONE (key, ts, tie) exchange: change detection via
    * lag, then interval close via lead over the surviving change rows
    * (Spark reuses the partitioning; no second shuffle). Determinism at
    * tied timestamps comes from the event-id tiebreak in BOTH sorts.
    * Epochs emitted as µs longs (the temporal-family convention).
    */
  def scd2History(events: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, tieCol: String): DataFrame = {
    val byKey = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col(tieCol))
    val changes = events
      .withColumn("_prev", lag(col(valueCol), 1).over(byKey))
      .filter(col("_prev").isNull || col("_prev") =!= col(valueCol))
    changes
      .withColumn("version", row_number().over(byKey).cast("long"))
      .withColumn("valid_from_us", unix_micros(col(tsCol)))
      .withColumn("valid_to_us", lead(unix_micros(col(tsCol)), 1)
        .over(byKey))
      .select(col(keyCol), col("version"),
        col(valueCol).as("state"),
        col("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
      .orderBy(keyCol, "version")
  }

  def q114Scd2History(s: SparkSession, d: String): DataFrame =
    scd2History(Tables.events(s, d), "user_id", "ts", "event_type",
      "event_id")

  /** INCREMENTAL SCD2 apply — the production write-path of
    * [[scd2History]] (the q98/q99 lifecycle story for the warehouse
    * layer): fold a NEW batch of observations into an EXISTING history
    * without re-reading the old observation stream. Closed rows pass
    * through untouched; each key's OPEN row is re-seeded as a synthetic
    * observation (its state at its valid_from, tie −1 so it sorts
    * before any real event at the same instant) and [[scd2History]]
    * runs over seed ∪ batch only — so a batch whose first value equals
    * the open state COLLAPSES into it (same as the rebuild would), a
    * change closes the open row at the change's ts, and versions
    * continue from the open row's number. BIT-EQUAL to rebuilding from
    * the full stream whenever the batch is strictly newer than every
    * old observation (Scd2 spec + q119 share q114's oracle on exactly
    * that split).
    *
    * Scale shape: the old side contributes |keys| open rows + closed
    * passthrough (a scan, no shuffle on the closed rows beyond the
    * final sort); all window work runs over seed ∪ batch — the
    * increment — never the historical stream.
    */
  def scd2Apply(history: DataFrame, newObs: DataFrame, keyCol: String,
                tsCol: String, valueCol: String, tieCol: String,
                validate: Boolean = true)
      : DataFrame = {
    val open = history.filter(col("is_current"))
      .select(col(keyCol), col("version").as("_v0"),
        col("state"), col("valid_from_us"))
    if (validate) {
      // the CHECKABLE half of the strictly-newer contract: a batch
      // observation at-or-before a key's open valid_from would sort
      // before the seed and silently corrupt the versioning. (The full
      // contract — batch newer than every old OBSERVATION, including
      // collapsed repeats after the last change — cannot be checked
      // from the history alone and stays the caller's obligation.)
      val violations = newObs
        .join(open.select(col(keyCol), col("valid_from_us")), Seq(keyCol))
        .filter(unix_micros(col(tsCol)) <= col("valid_from_us"))
        .count()
      require(violations == 0L,
        s"scd2Apply: $violations batch observation(s) at-or-before an " +
          "open row's valid_from — the batch must be strictly newer " +
          "than the history it folds into")
    }
    val seed = open.select(col(keyCol),
      expr("timestamp_micros(valid_from_us)").as(tsCol),
      col("state").as(valueCol), lit(-1L).cast("long").as(tieCol))
    val chain = scd2History(
      seed.unionByName(newObs.select(col(keyCol), col(tsCol),
        col(valueCol), col(tieCol).cast("long").as(tieCol))),
      keyCol, tsCol, valueCol, tieCol)
    val adjusted = chain
      .join(open.select(col(keyCol), col("_v0")), Seq(keyCol),
        "left_outer")
      // keys with an open row: chain version 1 IS that row re-derived —
      // shift so it keeps its old number; brand-new keys start at 1
      .withColumn("version",
        col("version") + coalesce(col("_v0") - 1, lit(0L)))
      .drop("_v0")
    history.filter(!col("is_current"))
      .unionByName(adjusted)
      .orderBy(keyCol, "version")
  }

  /** q119: [[scd2Apply]] folding the last ~third of the event stream
    * into the history built from the first two thirds — bit-equal to
    * q114's full rebuild (shares its oracle). Split at 2024-01-20.
    */
  def q119Scd2Incremental(s: SparkSession, d: String,
                          splitUs: Long = 1705708800000000L): DataFrame = {
    val ev = Tables.events(s, d)
    val old = ev.filter(unix_micros(col("ts")) <= splitUs)
    val batch = ev.filter(unix_micros(col("ts")) > splitUs)
    scd2Apply(
      scd2History(old, "user_id", "ts", "event_type", "event_id"),
      batch.select(col("user_id"), col("ts"), col("event_type"),
        col("event_id")),
      "user_id", "ts", "event_type", "event_id")
  }

  /** Time-travel read over the SCD2 history: reconstruct every key's
    * state as of an instant — one row-local interval filter over the
    * q114 build, no extra shuffle. Keys first observed after `asOfUs`
    * are absent (they did not exist yet).
    */
  def q115TimeTravel(s: SparkSession, d: String,
                     asOfUs: Long = 1705276800000000L): DataFrame = // 2024-01-15
    scd2History(Tables.events(s, d), "user_id", "ts", "event_type",
      "event_id")
      .filter(col("valid_from_us") <= asOfUs &&
        (col("valid_to_us").isNull || col("valid_to_us") > asOfUs))
      .select(col("user_id"), col("state"), col("version"),
        col("valid_from_us"))
      .orderBy("user_id")

  /** Sliding-window event rates: hourly counts + distinct users per
    * event type on a 1-hour window SLIDING by 30 minutes — the
    * overlapping-window shape rate monitoring uses (each event lands in
    * exactly two windows), and the batch twin of the streaming
    * `EventStreams.windowedCounts` tumbling form. Spark's `window(ts,
    * '1 hour', '30 minutes')` generates the per-event window structs
    * row-locally; the only shuffle is the aggregate on (window, type),
    * whose cardinality is (time range / slide) × |types| regardless of
    * event volume. Epoch-aligned starts mean the oracle reproduces the
    * assignment as two integer floor-divisions.
    */
  def q108SlidingRates(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
      .select(unix_timestamp(col("window.start")).as("window_epoch"),
        col("event_type"), col("n"), col("n_users"))
      .orderBy("window_epoch", "event_type")

  /** Event-RATE anomaly detection: hourly counts per type z-scored
    * against each type's TRAILING 24-hour window (mean/std over the 24
    * preceding hourly buckets, current excluded) — the ops-monitoring
    * pass a streaming ingest runs to catch rate spikes/collapses.
    *
    * Determinism discipline: mean and variance derive from INTEGER
    * window sums (Σn, Σn², count over the frame) — variance =
    * (cnt·Σn² − (Σn)²)/cnt², one integer expression per term — so the
    * only floats are the final division/sqrt on identical integers in
    * both engines. The frame windows run over the hourly AGGREGATE
    * (|hours × types| rows), not events; the one event-volume shuffle
    * is the hourly count itself.
    *
    * Baseline frame semantics, stated explicitly: the 24-row frame is
    * the 24 preceding hourly BUCKETS of that type, not 24 wall-clock
    * hours — a type with empty hour buckets gets a baseline spanning
    * more wall-clock time (empty hours produce no row, so nothing
    * anchors them in the frame). The z-score is only emitted once 24
    * buckets exist, so a sparse type simply reaches its baseline later;
    * callers needing a strict wall-clock window densify the hour grid
    * per type first (cross-join hours × types, zero-fill) and run the
    * same frame over the densified aggregate.
    */
  def q117RateAnomaly(s: SparkSession, d: String,
                      zGate: Double = 3.0): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy((unix_timestamp(col("ts")).divide(3600)).cast("long")
        .multiply(3600).as("hour_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val frame = Window.partitionBy("event_type").orderBy("hour_epoch")
      .rowsBetween(-24, -1)
    hourly
      .withColumn("w_cnt", count(lit(1)).over(frame))
      .withColumn("w_sum", sum(col("n")).over(frame))
      .withColumn("w_sumsq", sum(col("n") * col("n")).over(frame))
      .withColumn("z",
        when(col("w_cnt") === 24 &&
          col("w_cnt") * col("w_sumsq") > col("w_sum") * col("w_sum"),
          round((col("n") - col("w_sum") / col("w_cnt")) /
            sqrt((col("w_cnt") * col("w_sumsq") -
              col("w_sum") * col("w_sum")) /
              (col("w_cnt") * col("w_cnt"))), 6)))
      .select(col("hour_epoch"), col("event_type"), col("n"), col("z"),
        coalesce(abs(col("z")) > zGate, lit(false)).as("is_anomaly"))
      .orderBy("hour_epoch", "event_type")
  }

  /** Event-transition matrix (first-order Markov): for every adjacent
    * pair in each user's (ts, id)-ordered timeline, count
    * prev_type → type and its probability within the prev_type row.
    * One window + one aggregate, both riding the user_id exchange for
    * the lag; the matrix is |types|² cells regardless of event volume.
    */
  def q85Transitions(s: SparkSession, d: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(lag(col("event_type"), 1).over(ord).as("prev_type"),
        col("event_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n") /
        sum(col("n")).over(Window.partitionBy("prev_type")), 6))
      .orderBy("prev_type", "event_type")
  }

  /** Peak concurrency per day — how many intervals are open at once, at
    * the worst moment of each day — via the classic sweep line: +1 at
    * each start, −1 at each end (half-open [s, e): at equal ts an
    * ending interval closes BEFORE a starting one opens, which the
    * (t, delta) sort encodes since −1 < +1), running-sum the deltas,
    * max per day.
    *
    * The naive sweep needs ONE GLOBAL ordering — a single-partition
    * window, the canonical unscalable shape. This is the two-level
    * prefix sum instead: (1) running sum WITHIN each day partition
    * (hash shuffle on day, AQE-splittable); (2) each day's carried-in
    * count = the cumulative sum of all PRIOR days' totals, computed
    * with a global window over the per-day aggregate — deliberately
    * single-partition, but over |days| rows, not |events| (the tiny
    * side); (3) broadcast the carry back and add. Exact at any volume:
    * global_running(t) = carry(day(t)) + in_day_running(t).
    *
    * Determinism at tied timestamps: within a (t, delta) tie group the
    * running sum is order-dependent row-by-row but its MAX over the day
    * is not (+1 runs peak at their end, −1 runs at their start), so the
    * output is stable across partitionings — and matches the oracle's
    * single ORDER BY (t, delta) running sum.
    *
    * Each day's peak also considers the MIDNIGHT instant (= the carry
    * alone), so a day that only CLOSES carried-over intervals still
    * reports them. Output contains only days with at least one
    * interval endpoint: a delta-less day's concurrency is constant and
    * equals the carry of the next emitting day.
    */
  def peakConcurrency(intervals: DataFrame, startTs: String,
                      endTs: String): DataFrame = {
    // persisted: both prefix-sum levels (the in-day window and the
    // per-day carry aggregate) read this frame — without the barrier
    // each branch re-evaluates the interval source
    val deltas = Caches.persistTracked(intervals
      .select(col(startTs).as("t"), lit(1).as("delta"))
      .unionByName(intervals.select(col(endTs).as("t"),
        lit(-1).as("delta")))
      .withColumn("day", date_format(col("t"), "yyyy-MM-dd")))
    val byDay = Window.partitionBy("day").orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = deltas.withColumn("run_in_day",
      sum(col("delta")).over(byDay))
    // cross-day carry: a global window over the PER-DAY AGGREGATES
    // (one row per day, bounded by the time range, never event count) —
    // WindowExec's single-partition WARN here is expected and benign
    val carry = deltas.groupBy("day")
      .agg(sum(col("delta")).as("day_total"))
      .withColumn("carry", coalesce(
        sum(col("day_total")).over(Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("day", "carry")
    within.join(broadcast(carry), Seq("day"))
      .groupBy(col("day"), col("carry"))
      // the day's worst moment is either just after some delta
      // (carry + run_in_day) or the MIDNIGHT instant itself (carry +
      // 0, before any delta fires) — a day whose first delta is a −1
      // otherwise under-reports the windows still open from yesterday
      .agg(greatest(max(col("run_in_day")), lit(0L)).as("mx"))
      .select(col("day"), (col("carry") + col("mx")).as("peak"))
      .orderBy("day")
  }

  /** Incident-window annotation: every `error` event opens a GLOBAL
    * 5-minute window [ts, ts+5min); every event is annotated with how
    * many open windows contain it and the earliest containing window's
    * id (0/null when none — an error is always inside its own window).
    * The UNKEYED range-join shape: naive Spark executes the inequality
    * condition as a nested loop over |events|×|errors|; [[rangeJoin]]
    * makes it a hash join on the 5-minute bin. The inventory-wide
    * no-nested-loop plan pin guards exactly this regression.
    */
  def q87RangeWindows(s: SparkSession, d: String): DataFrame = {
    // one persisted narrow projection feeds all three uses (range-join
    // points, window derivation, left-outer join back) — Spark has no
    // cross-branch subplan reuse, so without it the query scans the
    // events table three times
    val points = Caches.persistTracked(Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("ts")))
    val win = 5L * 60 * 1000000
    val windows = points.filter(col("event_type") === "error")
      .select(col("event_id").as("window_id"), col("ts").as("w_start"),
        timestamp_micros(unix_micros(col("ts")) + win).as("w_end"))
    val agg = rangeJoin(points, "ts", windows, "w_start", "w_end", win)
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_windows"),
        min(col("window_id")).as("first_window"))
    points.select("event_id", "event_type")
      .join(agg, Seq("event_id"), "left_outer")
      .select(col("event_id"), col("event_type"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        col("first_window"))
      .orderBy("event_id")
  }

  /** Cross-user session overlap: per-user 4-hour-gap activity sessions
    * (q80's definition, reduced to their [first, last] event span,
    * CLOSED so single-event sessions still overlap their containers),
    * each annotated with how many OTHER users' sessions overlap it in
    * time — the interval×interval join behind concurrency and
    * contention analytics. Unkeyed overlap via [[intervalOverlapJoin]]
    * on 6-hour bins; the session frame is persisted because it feeds
    * both overlap sides and the left-outer join back.
    *
    * Scale note: the OUTPUT is inherently ∝ overlap density (a span
    * with k concurrent sessions yields k(k−1) pairs) — that's the
    * semantics, not the plan; the bin rewrite only removes the
    * |sessions|² candidate blow-up on top of it.
    */
  def q88SessionOverlap(s: SparkSession, d: String): DataFrame = {
    val gapUs = 4L * 3600 * 1000000
    val ev = Tables.events(s, d)
    val ord = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(ord)
    val fresh = when(prev.isNull ||
      unix_micros(col("ts")) - unix_micros(prev) > gapUs, 1).otherwise(0)
    val sessions = Caches.persistTracked(
      ev.withColumn("session_seq", sum(fresh).over(run))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end")))
    val other = sessions.select(col("user_id").as("o_user"),
      col("s_start").as("o_start"), col("s_end").as("o_end"))
    val agg = intervalOverlapJoin(sessions, "s_start", "s_end",
        other, "o_start", "o_end", binUs = 6L * 3600 * 1000000)
      .filter(col("user_id") =!= col("o_user"))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_overlap"))
    sessions.join(agg, Seq("user_id", "session_seq"), "left_outer")
      .select(col("user_id"), col("session_seq"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .orderBy("user_id", "session_seq")
  }

  /** Daily peak concurrent incident windows (q87's 5-minute error
    * windows through [[peakConcurrency]]'s two-level prefix sum).
    */
  def q89PeakConcurrency(s: SparkSession, d: String): DataFrame = {
    val win = 5L * 60 * 1000000
    val windows = Tables.events(s, d)
      .filter(col("event_type") === "error")
      .select(col("ts").as("w_start"),
        timestamp_micros(unix_micros(col("ts")) + win).as("w_end"))
    peakConcurrency(windows, "w_start", "w_end")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q79_asof_attribution" -> (q79ClickAttribution _),
    "q80_gap_sessions" -> (q80GapSessions _),
    "q82_retention_cohorts" -> (q82Retention _),
    "q83_funnel_attribution" -> (q83Funnel _),
    "q84_value_percentiles" -> (q84Percentiles _),
    "q85_event_transitions" -> (q85Transitions _),
    // q86/q91 register their GATE forms (since r12): sketch values are
    // engine-specific, so the gates output the exact brackets/cells +
    // in-plan verdicts that the sketch landed inside — fully
    // oracle-checkable; the pure sketch forms remain the operators and
    // ApproxTwinSpec's subjects
    "q86_value_percentiles_approx" -> (q86PercentilesGate _),
    "q87_range_windows" -> (q87RangeWindows _),
    "q88_session_overlap" -> (q88SessionOverlap _),
    "q89_peak_concurrency" -> (q89PeakConcurrency _),
    "q91_retention_cohorts_approx" -> (q91RetentionGate _),
    // the streaming as-of driven through a real micro-batched replay —
    // bit-equal to q79 under the replay's ordering discipline, so it
    // shares q79's oracle (ReplayParity scaladoc has the argument)
    "q100_streaming_asof_replay" ->
      (graft.streaming.ReplayParity.q100StreamingAsOfReplay _))

  /** q82's oracle — also the body of q91's gate oracle (the gate
    * outputs the exact cells + a TRUE sketch verdict); edit together.
    */
  private lazy val q82OracleSql: String =
    """WITH labeled AS (
      |  SELECT user_id,
      |    strftime(ts, '%Y-%m-%d') AS act_day,
      |    strftime(min(ts) OVER (PARTITION BY user_id), '%Y-%m-%d')
      |      AS cohort
      |  FROM events),
      |cells AS (
      |  SELECT cohort, act_day, count(DISTINCT user_id) AS n_active
      |  FROM labeled GROUP BY 1, 2)
      |SELECT cohort, act_day, n_active,
      |  round(n_active /
      |    CAST(max(CASE WHEN act_day = cohort THEN n_active END)
      |         OVER (PARTITION BY cohort) AS DOUBLE), 6) AS retention
      |FROM cells ORDER BY cohort, act_day""".stripMargin

  /** q79's oracle — also q100's (the streaming replay is bit-equal to
    * the batch as-of under the replay ordering); edit together.
    */
  private lazy val q79OracleSql: String =
    """SELECT c.event_id AS click_id, c.user_id,
      |  v.event_id AS view_id,
      |  epoch_us(c.ts) - epoch_us(v.ts) AS lag_us
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |-- right side deduped to max event_id per (user, ts): the
      |-- deterministic tie rule asOfJoin's rightTie implements
      |ASOF LEFT JOIN (
      |  SELECT user_id, ts, max(event_id) AS event_id
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2) v
      |  ON c.user_id = v.user_id AND c.ts >= v.ts
      |ORDER BY click_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q79_asof_attribution" -> q79OracleSql,
    "q100_streaming_asof_replay" -> q79OracleSql,
    "q80_gap_sessions" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ts
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(sum(CASE WHEN prev_ts IS NULL
        |               OR epoch_us(ts) - epoch_us(prev_ts) > 14400000000
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS session_seq
        |  FROM o)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us,
        |  min(event_id) AS min_event_id, max(event_id) AS max_event_id
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q82_retention_cohorts" -> q82OracleSql,
    // q86/q91 gate-form oracles: exact brackets/cells via DuckDB, and
    // the sketch verdicts asserted TRUE — a sketch drifting outside its
    // published bound hash-mismatches here
    "q86_value_percentiles_approx" ->
      """SELECT event_type, count(*) AS n,
        |  round(quantile_cont(value, 0.49), 6) AS lo50,
        |  round(quantile_cont(value, 0.51), 6) AS hi50,
        |  TRUE AS p50_ok,
        |  round(quantile_cont(value, 0.89), 6) AS lo90,
        |  round(quantile_cont(value, 0.91), 6) AS hi90,
        |  TRUE AS p90_ok,
        |  round(quantile_cont(value, 0.985), 6) AS lo99,
        |  round(quantile_cont(value, 0.995), 6) AS hi99,
        |  TRUE AS p99_ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q91_retention_cohorts_approx" ->
      s"""SELECT q.*, TRUE AS approx_ok FROM ($q82OracleSql) q
         |ORDER BY cohort, act_day""".stripMargin,
    "q83_funnel_attribution" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts
        |           FROM events WHERE event_type = 'purchase'),
        |-- right sides deduped to max event_id per (user, ts): the
        |-- deterministic tie rule asOfJoin's rightTie implements
        |c AS (SELECT user_id, ts, max(event_id) AS click_id
        |      FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |v AS (SELECT user_id, ts, max(event_id) AS view_id
        |      FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |pc AS (
        |  SELECT p.purchase_id, p.user_id, p.ts AS p_ts,
        |    c.click_id, c.ts AS c_ts
        |  FROM p ASOF LEFT JOIN c
        |    ON p.user_id = c.user_id AND p.ts >= c.ts),
        |pcv AS (
        |  SELECT pc.*, v.view_id, v.ts AS v_ts
        |  FROM pc ASOF LEFT JOIN v
        |    ON pc.user_id = v.user_id AND pc.c_ts >= v.ts)
        |SELECT purchase_id, user_id, click_id,
        |  epoch_us(p_ts) - epoch_us(c_ts) AS click_lag_us,
        |  -- DuckDB's ASOF sorts a NULL inequality key after every row,
        |  -- so a purchase with NO prior click "matches" the latest
        |  -- view; a null anchor must match nothing — mask it
        |  CASE WHEN click_id IS NULL THEN NULL ELSE view_id END
        |    AS view_id,
        |  epoch_us(c_ts) - epoch_us(v_ts) AS view_lag_us,
        |  coalesce(epoch_us(p_ts) - epoch_us(c_ts) <= 604800000000
        |       AND epoch_us(c_ts) - epoch_us(v_ts) <= 604800000000,
        |    false) AS full_funnel
        |FROM pcv ORDER BY purchase_id""".stripMargin,
    "q84_value_percentiles" ->
      """SELECT event_type, count(*) AS n,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q85_event_transitions" ->
      """WITH t AS (
        |  SELECT lag(event_type)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_type,
        |    event_type
        |  FROM events)
        |SELECT prev_type, event_type, count(*) AS n,
        |  round(count(*) /
        |    CAST(sum(count(*)) OVER (PARTITION BY prev_type) AS DOUBLE),
        |    6) AS p
        |FROM t WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q87_range_windows" ->
      """WITH w AS (
        |  SELECT event_id AS window_id, epoch_us(ts) AS s_us
        |  FROM events WHERE event_type = 'error'),
        |m AS (
        |  SELECT e.event_id, count(*) AS n_windows,
        |    min(w.window_id) AS first_window
        |  FROM events e JOIN w
        |    ON epoch_us(e.ts) >= w.s_us
        |   AND epoch_us(e.ts) < w.s_us + 300000000
        |  GROUP BY 1)
        |SELECT e.event_id, e.event_type,
        |  coalesce(m.n_windows, 0) AS n_windows, m.first_window
        |FROM events e LEFT JOIN m ON e.event_id = m.event_id
        |ORDER BY e.event_id""".stripMargin,
    "q88_session_overlap" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ts
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    CAST(sum(CASE WHEN prev_ts IS NULL
        |               OR epoch_us(ts) - epoch_us(prev_ts) > 14400000000
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS session_seq
        |  FROM o),
        |sess AS (
        |  SELECT user_id, session_seq,
        |    min(ts) AS s_start, max(ts) AS s_end
        |  FROM s GROUP BY 1, 2),
        |ov AS (
        |  SELECT a.user_id, a.session_seq, count(*) AS n_overlap
        |  FROM sess a JOIN sess b
        |    ON a.user_id <> b.user_id
        |   AND a.s_start <= b.s_end AND b.s_start <= a.s_end
        |  GROUP BY 1, 2)
        |SELECT s.user_id, s.session_seq,
        |  coalesce(o.n_overlap, 0) AS n_overlap
        |FROM sess s LEFT JOIN ov o
        |  ON s.user_id = o.user_id AND s.session_seq = o.session_seq
        |ORDER BY s.user_id, s.session_seq""".stripMargin,
    "q89_peak_concurrency" ->
      """WITH w AS (
        |  SELECT epoch_us(ts) AS s_us, epoch_us(ts) + 300000000 AS e_us
        |  FROM events WHERE event_type = 'error'),
        |d AS (
        |  SELECT s_us AS t_us, 1 AS delta FROM w
        |  UNION ALL
        |  SELECT e_us AS t_us, -1 AS delta FROM w),
        |r AS (
        |  SELECT strftime(make_timestamp(t_us), '%Y-%m-%d') AS day,
        |    delta,
        |    CAST(sum(delta) OVER (ORDER BY t_us, delta
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS run
        |  FROM d),
        |m AS (SELECT day, max(run) AS mx FROM r GROUP BY day),
        |-- a day's peak can be the MIDNIGHT instant: the carry of all
        |-- prior days' deltas, before any of the day's own rows fire
        |c AS (
        |  SELECT day, CAST(coalesce(sum(day_total) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS carry
        |  FROM (SELECT day, sum(delta) AS day_total FROM r GROUP BY day))
        |SELECT m.day, greatest(m.mx, c.carry) AS peak
        |FROM m JOIN c USING (day) ORDER BY day""".stripMargin)
}
