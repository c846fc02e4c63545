package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2.2-§2.6) re-expressed over the
  * driver testdata tables. Each query is the Spark-first shape of a reference
  * operator (cited per method); the matching DuckDB oracle SQL lives in
  * [[Relational.oracle]] with identical column aliases.
  *
  * Float discipline: any aggregated DOUBLE goes through [[moneySum]] —
  * quantize to integer scale-ths (round; half-up agrees across engines on
  * identical binaries), sum in an overflow-proof DECIMAL(38,0) accumulator
  * (exact, order-independent, so parallel partial aggregation is
  * deterministic), then present as DOUBLE via one exact int→double cast and
  * one IEEE division. The DOUBLE presentation matters: engines render
  * DECIMAL results scale-aware ("253942.00") but DOUBLE shortest
  * ("253942.0"), so a decimal-typed output column hash-mismatches any
  * oracle path that reads one side as float — r02's five hash failures were
  * exactly the queries whose decimal outputs contained a trailing-zero last
  * digit. Ratios are computed as `money_sum / count`, one further IEEE op
  * on identical inputs, hence deterministic.
  *
  * Determinism discipline: every window/order used for row_number or
  * pagination carries a unique tiebreaker column (the table's key).
  */
object Relational {

  /** Exact engine-neutral money/measure sum: `cast(sum(cast(round(e * 10^s)
    * as decimal(38,0))) as double) / 10^s`. Mirror the same text in the
    * oracle SQL. Exact below 2^53 scale-ths; beyond that the DOUBLE
    * presentation is approximate anyway (production wide sums should keep
    * the DECIMAL(38,0) accumulator column instead).
    */
  private[graft] def moneySum(e: Column, scale: Int): Column = {
    val f = lit(math.pow(10, scale))
    sum(round(e * f).cast("decimal(38,0)")).cast("double") / f
  }

  /** Window form of [[moneySum]] (running/cumulative exact sums). */
  private[graft] def moneySumOver(e: Column, scale: Int,
      w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    val f = lit(math.pow(10, scale))
    sum(round(e * f).cast("decimal(38,0)")).over(w).cast("double") / f
  }

  /** §2.4 multi-agg report sums (reference api/routers/analytics_routes.py:71-92)
    * — TPC-H Q1 shape. One hash aggregate on a 6-value grouping key: partial
    * aggregation map-side, single shuffle of 6 rows per partition. Scales
    * linearly; no skew possible with bounded key cardinality.
    */
  def q02PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        moneySum(col("l_quantity"), 2).as("sum_qty"),
        moneySum(col("l_extendedprice"), 2).as("sum_base"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("sum_disc"),
        (moneySum(col("l_quantity"), 2) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  /** §2.2 equality + timestamp >= predicates, narrow projection (reference
    * api/routers/queue_routes.py:73-77). Both filters and the 4-column
    * projection push to the parquet scan (PushedFilters + ReadSchema).
    */
  def q03FilterProject(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderstatus") === "O" &&
        col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")

  /** §2.2 IN-list + prefix-LIKE (reference models/listing.py:72-75 reid_id
    * prefix scan; queue_routes.py:81 IN). Predicates push down to the scan.
    */
  def q04LikeIn(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_type").isin("ECONOMY", "SMALL") &&
        col("p_brand").like("Brand#1%"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .orderBy("p_brand")

  /** §2.5 latest-per-group (reference api/routers/analytics_routes.py:63-67:
    * latest report per source). Window replaces the ORM's join-on-max
    * subquery: one shuffle on the partition key, no self-join.
    */
  def q05LatestPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_orderdate")
  }

  /** §2.2 EXISTS over child table (reference tag_routes.py:57-63:
    * Property.tags.any(...)). Left-semi join: the build side carries no
    * payload and each left row emits at most once — no fan-out at scale.
    */
  def q06ExistsSemi(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).as("c")
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F").as("o"),
        col("c.c_custkey") === col("o.o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")

  /** §2.2/§2.6 NOT-IN anti set (reference data_routes.py:105,117-118:
    * upload urls not already queued). Left-anti join with a pre-filtered
    * right side; at scale the right side shrinks before the shuffle.
    */
  def q07AntiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).as("c")
      .join(Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT").as("o"),
        col("c.c_custkey") === col("o.o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** §2.4 monthly bucketed agg (reference analytics_routes.py:22-47 shape
    * over the events table, adding a type dimension). date_format bucketing
    * stays inside whole-stage codegen.
    */
  def q08MonthlyTypeAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_format(col("ts"), "yyyy-MM").as("month"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        moneySum(col("value"), 2).as("sum_value"))
      .orderBy("month", "event_type")

  /** §2.4 queue-stats pivot (reference api/routers/data_routes.py:48-61:
    * group_by(status) count → fixed keys + total). Conditional counts in a
    * single pass — one aggregate, no pivot shuffle.
    */
  def q09StatusPivot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).agg(
      count(when(col("o_orderstatus") === "F", 1)).as("cnt_f"),
      count(when(col("o_orderstatus") === "O", 1)).as("cnt_o"),
      count(when(col("o_orderstatus") === "P", 1)).as("cnt_p"),
      count(lit(1)).as("total"))

  /** §2.4 join + group counts (reference tag_routes.py:24-40: tag counts).
    * Dimension side broadcast — no shuffle of the fact table for the join;
    * the only shuffle is the low-cardinality aggregation.
    */
  def q10JoinAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        moneySum(col("o_totalprice"), 2).as("sum_price"))
      .orderBy("c_mktsegment")

  /** §2.3 multi-way dimension join (TPC-H Q5 shape; reference joins are at
    * most 2-way — this proves the chain composes). All dimension sides
    * broadcast: the 100 TB fact table never shuffles for the joins, only for
    * the final 5-row aggregate.
    */
  def q11Join5Way(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
        .as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("r_name")

  /** §2.3 left-outer dimension lookup (reference tag_routes.py:78-91: the
    * N+1 per-row Listing lookup, done set-based). Two broadcast hash joins,
    * zero shuffles.
    */
  def q12LeftOuter(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"), "left_outer")
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"), "left_outer")
      .select("c_custkey", "n_name", "r_name")

  /** §2.3 cross-source duplicate detection (reference
    * reid/pipelines/property.py:131-143: 6-key equi self-join, source !=
    * source, first match only). Keys here are (p_size, p_type); "source" is
    * p_brand. First-match = row_number over the left key — reproduces the
    * ORM's `.first()`.
    *
    * Scale note: a self-join on low-selectivity keys fans out quadratically
    * per group; the reference's real key set (price+beds+baths+sizes) keeps
    * groups near-singleton. Salting/AQE-skew handles the residual hot keys.
    */
  def q13DupCrossSource(s: SparkSession, d: String): DataFrame = {
    val part = Tables.part(s, d)
    val pairs = part.as("a")
      .join(part.as("b"),
        col("a.p_size") === col("b.p_size") &&
          col("a.p_type") === col("b.p_type") &&
          col("a.p_brand") =!= col("b.p_brand") &&
          col("a.p_partkey") =!= col("b.p_partkey"))
      .select(col("a.p_partkey").as("partkey"), col("b.p_partkey").as("dup_partkey"))
    val w = Window.partitionBy("partkey").orderBy("dup_partkey")
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("partkey", "dup_partkey")
  }

  /** §2.3 same-source duplicate detection (reference
    * reid/pipelines/property.py:155-168: same keys AND same source,
    * different url). NB reference uses SQL `=` semantics: NULL keys never
    * match — Spark `===` preserves that (never `<=>`, SURVEY §7.4.6).
    */
  def q14SelfJoinDup(s: SparkSession, d: String): DataFrame = {
    val part = Tables.part(s, d)
    val pairs = part.as("a")
      .join(part.as("b"),
        col("a.p_size") === col("b.p_size") &&
          col("a.p_type") === col("b.p_type") &&
          col("a.p_brand") === col("b.p_brand") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .select(col("a.p_partkey").as("partkey"), col("b.p_partkey").as("dup_partkey"))
    val w = Window.partitionBy("partkey").orderBy("dup_partkey")
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("partkey", "dup_partkey")
  }

  /** §2.3 left-semi queue⋈listing (reference queue_routes.py:79-99: urls IN
    * subquery + status filter).
    */
  def q15SemiJoin(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).as("o")
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R").as("l"),
        col("o.o_orderkey") === col("l.l_orderkey"), "left_semi")
      .select("o_orderkey", "o_orderstatus")

  /** §2.5 reid_id sequential business key (reference models/listing.py:66-85:
    * REID_yy_mm_CODE_NNN, per (month, source-code) partition). The ORM does
    * a read-max-then-insert round-trip per row; here one window pass assigns
    * the whole batch deterministically (orderBy the table key).
    * Partition count = months × codes — small, but each partition's rows
    * shuffle to one task; at 100 TB the key space (~months×sources) still
    * bounds per-task rows to a month-source slice, same as the reference's
    * semantics require (sequence is inherently per-partition serial).
    */
  def q16WindowSeqId(s: SparkSession, d: String): DataFrame = {
    val w = Window
      .partitionBy(date_format(col("o_orderdate"), "yy-MM"), col("o_orderpriority"))
      .orderBy("o_orderkey")
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .select(col("o_orderkey"),
        format_string("REID_%s_%s_%s_%03d",
          date_format(col("o_orderdate"), "yy"),
          date_format(col("o_orderdate"), "MM"),
          substring(col("o_orderpriority"), 1, 1),
          col("rn")).as("reid_id"))
  }

  /** §2.6 top-k per group (reference tag_routes.py:64-73 pagination shape,
    * per-group variant). row_number + filter: ranking shuffles once on the
    * group key; ties broken by the unique order key for determinism.
    */
  def q17TopkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("c_mktsegment", "rk", "o_orderkey", "o_totalprice")
  }

  /** §2.5 running aggregate per key (cumulative account balance shape).
    * Exact integer-cents running sum ([[moneySumOver]]) so the cumulative
    * value is exact and order-independent; frame is ROWS (not the default
    * RANGE) with a unique tiebreaker so every prefix is well-defined.
    */
  def q18RunningAgg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        moneySumOver(col("o_totalprice"), 2, w).as("running_total"))
  }

  /** §2.6 offset/limit pagination (reference queue_routes.py:29-37:
    * order_by desc, offset (page-1)*50, limit 50 — page 3 here). Spark's
    * native offset+limit collapses to a single CollectLimit — no global
    * sort materialization.
    */
  def q19Pagination(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      .offset(100).limit(50)
      .select("o_orderkey", "o_orderdate", "o_totalprice")

  /** §2.6 distinct + sort (reference queue_routes.py:53-58: sorted unique
    * domains). Partial-distinct map-side, tiny shuffle.
    */
  def q20DistinctSort(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select("event_type").distinct().orderBy("event_type")

  /** §2.6 union + dedup (reference ml_region_prediction.py:33-39: union of
    * two sources; data_routes.py:121 list(set(urls))).
    */
  def q21UnionDedup(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    ev.filter(col("event_type") === "click").select("user_id")
      .unionByName(ev.filter(col("event_type") === "view").select("user_id"))
      .distinct()
  }

  /** §2.6 top-1 (reference models/listing.py:72-75: ORDER BY reid_id DESC
    * LIMIT 1). TakeOrderedAndProject: per-partition top-1 then driver merge
    * of 32 candidates — never a global sort.
    */
  def q22Top1(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(1)
      .select("o_orderkey", "o_totalprice")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q02_pricing_summary" -> (q02PricingSummary _),
    "q03_filter_project" -> (q03FilterProject _),
    "q04_like_in" -> (q04LikeIn _),
    "q05_latest_per_group" -> (q05LatestPerGroup _),
    "q06_exists_semi" -> (q06ExistsSemi _),
    "q07_anti_join" -> (q07AntiJoin _),
    "q08_monthly_type_agg" -> (q08MonthlyTypeAgg _),
    "q09_status_pivot" -> (q09StatusPivot _),
    "q10_join_agg" -> (q10JoinAgg _),
    "q11_join_5way" -> (q11Join5Way _),
    "q12_left_outer" -> (q12LeftOuter _),
    "q13_dup_cross_source" -> (q13DupCrossSource _),
    "q14_self_join_dup" -> (q14SelfJoinDup _),
    "q15_semi_join" -> (q15SemiJoin _),
    "q16_window_seq_id" -> (q16WindowSeqId _),
    "q17_topk_per_group" -> (q17TopkPerGroup _),
    "q18_running_agg" -> (q18RunningAgg _),
    "q19_pagination" -> (q19Pagination _),
    "q20_distinct_sort" -> (q20DistinctSort _),
    "q21_union_dedup" -> (q21UnionDedup _),
    "q22_top1" -> (q22Top1 _))

  val oracle: Map[String, String] = Map(
    "q02_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(round(l_quantity * 100.0) AS DECIMAL(38,0))) AS DOUBLE) / 100.0 AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100.0) AS DECIMAL(38,0))) AS DOUBLE) / 100.0 AS sum_base,
        |  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000.0) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS sum_disc,
        |  CAST(sum(CAST(round(l_quantity * 100.0) AS DECIMAL(38,0))) AS DOUBLE) / 100.0 / count(*) AS avg_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q03_filter_project" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice FROM orders
        |WHERE o_orderstatus = 'O' AND o_orderdate >= TIMESTAMP '1998-01-01'""".stripMargin,
    "q04_like_in" ->
      """SELECT p_brand, count(*) AS n FROM part
        |WHERE p_type IN ('ECONOMY','SMALL') AND p_brand LIKE 'Brand#1%'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q05_latest_per_group" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) t WHERE rn = 1""".stripMargin,
    "q06_exists_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,
    "q08_monthly_type_agg" ->
      """SELECT strftime(ts, '%Y-%m') AS month, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value * 100.0) AS DECIMAL(38,0))) AS DOUBLE) / 100.0 AS sum_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q09_status_pivot" ->
      """SELECT
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS cnt_f,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS cnt_o,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS cnt_p,
        |  count(*) AS total
        |FROM orders""".stripMargin,
    "q10_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100.0) AS DECIMAL(38,0))) AS DOUBLE) / 100.0 AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q11_join_5way" ->
      """SELECT r_name,
        |  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000.0) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q12_left_outer" ->
      """SELECT c_custkey, n_name, r_name FROM customer
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey""".stripMargin,
    "q13_dup_cross_source" ->
      """SELECT partkey, dup_partkey FROM (
        |  SELECT a.p_partkey AS partkey, b.p_partkey AS dup_partkey,
        |    row_number() OVER (PARTITION BY a.p_partkey ORDER BY b.p_partkey) AS rn
        |  FROM part a JOIN part b ON a.p_size = b.p_size AND a.p_type = b.p_type
        |  WHERE a.p_brand <> b.p_brand AND a.p_partkey <> b.p_partkey) t
        |WHERE rn = 1""".stripMargin,
    "q14_self_join_dup" ->
      """SELECT partkey, dup_partkey FROM (
        |  SELECT a.p_partkey AS partkey, b.p_partkey AS dup_partkey,
        |    row_number() OVER (PARTITION BY a.p_partkey ORDER BY b.p_partkey) AS rn
        |  FROM part a JOIN part b ON a.p_size = b.p_size AND a.p_type = b.p_type
        |    AND a.p_brand = b.p_brand
        |  WHERE a.p_partkey < b.p_partkey) t
        |WHERE rn = 1""".stripMargin,
    "q15_semi_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')""".stripMargin,
    "q16_window_seq_id" ->
      """SELECT o_orderkey,
        |  printf('REID_%s_%s_%s_%03d',
        |    strftime(o_orderdate, '%y'), strftime(o_orderdate, '%m'),
        |    substr(o_orderpriority, 1, 1),
        |    row_number() OVER (PARTITION BY strftime(o_orderdate, '%y-%m'), o_orderpriority
        |      ORDER BY o_orderkey)) AS reid_id
        |FROM orders""".stripMargin,
    "q17_topk_per_group" ->
      """SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey) t
        |WHERE rk <= 3""".stripMargin,
    "q18_running_agg" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(round(o_totalprice * 100.0) AS DECIMAL(38,0))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS running_total
        |FROM orders""".stripMargin,
    "q19_pagination" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        |ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 50 OFFSET 100""".stripMargin,
    "q20_distinct_sort" ->
      "SELECT DISTINCT event_type FROM events ORDER BY 1",
    "q21_union_dedup" ->
      """SELECT DISTINCT user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id FROM events WHERE event_type = 'view') t""".stripMargin,
    "q22_top1" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1""".stripMargin)
}
