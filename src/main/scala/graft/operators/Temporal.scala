package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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
                       tsCol: String): DataFrame = {
    val byUser = Window.partitionBy(userCol)
    val labeled = events.select(col(userCol).as("user_id"),
        date_format(col(tsCol), "yyyy-MM-dd").as("act_day"),
        date_format(min(col(tsCol)).over(byUser), "yyyy-MM-dd")
          .as("cohort"))
    val cells = labeled.groupBy("cohort", "act_day")
      .agg(countDistinct(col("user_id")).as("n_active"))
    cells.withColumn("retention", round(col("n_active") /
        max(when(col("act_day") === col("cohort"), col("n_active")))
          .over(Window.partitionBy("cohort")), 6))
      .orderBy("cohort", "act_day")
  }

  /** q82: the daily retention matrix over the events table. */
  def q82Retention(s: SparkSession, d: String): DataFrame =
    retentionCohorts(Tables.events(s, d), "user_id", "ts")

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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q79_asof_attribution" -> (q79ClickAttribution _),
    "q80_gap_sessions" -> (q80GapSessions _),
    "q82_retention_cohorts" -> (q82Retention _),
    "q83_funnel_attribution" -> (q83Funnel _),
    "q84_value_percentiles" -> (q84Percentiles _),
    "q85_event_transitions" -> (q85Transitions _),
    // q86 has NO oracle entry by design: approx_percentile is a t-digest
    // sketch whose exact outputs are engine-specific → rows-only check
    "q86_value_percentiles_approx" -> (q86PercentilesApprox _))

  val oracle: Map[String, String] = Map(
    "q79_asof_attribution" ->
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
        |ORDER BY click_id""".stripMargin,
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
    "q82_retention_cohorts" ->
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
        |FROM cells ORDER BY cohort, act_day""".stripMargin,
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
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
