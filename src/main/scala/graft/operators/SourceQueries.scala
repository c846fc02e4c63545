package graft

import java.time.LocalDate
import graft.functions.Cleaners
import graft.sources.{Sinks, Sources}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable queries for the source connectors (SURVEY §2.1) and
  * serving analytics (§2.4-§2.6) not yet covered: JSON-API parse,
  * HTML-in-JSON envelope, frontier dedup, crawl report (with the +31-day
  * quirk), tag counts with the solved/ignored workflow, queue pagination,
  * unique domains, delist sync, monthly reid buckets.
  */
object SourceQueries {

  private def k = col("o_orderkey")

  /** events-derived synthetic queue: url with deliberate duplicates,
    * 5-way status, the event timestamp as created_at.
    */
  private def queue(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id").as("id"),
      concat(lit("https://s"), (col("user_id") % 16), lit(".x.com/p"),
        (col("event_id") % 997)).as("url"),
      when(col("event_id") % 5 === 0, "Error")
        .when(col("event_id") % 5 === 1, "Delisted")
        .when(col("event_id") % 5 === 2, "Sold")
        .otherwise("Available").as("status"),
      col("ts").as("created_at"))

  /** §2.1 JSON-API source: WP-REST-shaped payloads parsed with an explicit
    * schema (from_json, null-on-error).
    */
  def q44JsonApi(s: SparkSession, d: String): DataFrame = {
    val payload = Tables.events(s, d).select(
      concat(lit("{\"id\": "), col("event_id"),
        lit(", \"title\": {\"rendered\": \"Villa "), col("event_id"),
        lit("\"}, \"price\": "), (col("event_id") % 1000) * 100,
        lit(", \"status\": \"publish\"}")).as("payload"))
    Sources.jsonApi(payload, "payload")
  }

  /** §2.1 HTML-in-JSON envelope (admin-ajax shape): JSON parse then HTML
    * regex extraction then price parse.
    */
  def q45HtmlInJson(s: SparkSession, d: String): DataFrame =
    Sources.htmlInJson(
      Tables.events(s, d).select(
        concat(lit("{\"content\": \"<div class=\\\"title\\\">T"), col("event_id"),
          lit("</div> IDR "), (col("event_id") % 500) + 1,
          lit(".000.000\"}")).as("envelope")),
      "envelope")

  /** §2.1 frontier dedup: one fetch per unique url, counted per domain. */
  def q46FrontierDedup(s: SparkSession, d: String): DataFrame =
    Sources.frontierDedup(queue(s, d))
      .select(Cleaners.getDomain(col("url")).as("domain"))
      .groupBy("domain").agg(count(lit(1)).as("n"))
      .orderBy("domain")

  /** §2.4 crawl report with the reference's month-after window quirk. */
  def q47CrawlReport(s: SparkSession, d: String): DataFrame = {
    val reports = Tables.events(s, d).select(
      concat(lit("src"), (col("user_id") % 16)).as("source"),
      col("ts").as("created_at"),
      (col("event_id") % 100).as("item_scraped_count"),
      (col("event_id") % 7).as("response_error_count"),
      (col("event_id") % 50).as("elapsed_time_seconds"))
    Analytics.crawlReport(reports, "2023-12-01")
  }

  /** §2.4 tag counts over the quality-rule tags with the solved/ignored
    * workflow flags (tag_routes.py:24-40).
    */
  def q48TagCounts(s: SparkSession, d: String): DataFrame = {
    val props = EtlQueries.propsFixture(s, d) // shared with q29 + both oracles
    val key = expr("cast(substring(property_id, 2) as long)")
    val tags = Quality.explodeTags(props, "id")
      .withColumn("is_solved", (length(col("name")) + key) % 5 === 0)
      .withColumn("is_ignored", key % 7 === 0)
    Analytics.tagCounts(tags, props.select(col("id")))
  }

  /** §2.8 bulk mark-as-solved workflow (tag_routes.py:258-317): the q48
    * tag table with flags, a request marking every key%5==0 property's
    * `no_bedrooms` tag solved, grouped so the oracle compares the full
    * flag distribution.
    */
  def q56TagMark(s: SparkSession, d: String): DataFrame = {
    val props = EtlQueries.propsFixture(s, d)
    val key = expr("cast(substring(property_id, 2) as long)")
    val tags = Quality.explodeTags(props, "id")
      .withColumn("is_solved", (length(col("name")) + key) % 5 === 0)
      .withColumn("is_ignored", key % 7 === 0)
    val ids = props.select(col("id").as("property_id"))
      .filter(expr("cast(substring(property_id, 2) as long) % 5 = 0"))
    Quality.markTags(tags, ids, "no_bedrooms", "solved")
      .groupBy("name", "is_solved", "is_ignored")
      .agg(count(lit(1)).as("n"))
      .orderBy("name", "is_solved", "is_ignored")
  }

  /** §2.3/§2.6 tag detail page (tag_routes.py:43-127): open-tag
    * properties, source-ordered page, url-deduped, enriched with the
    * listing lookup set-based.
    */
  def q57TagDetail(s: SparkSession, d: String): DataFrame = {
    val key = expr("cast(substring(id, 2) as long)")
    val props = EtlQueries.propsFixture(s, d)
      .withColumn("url", concat(lit("u"), key % 1200))
      .withColumn("source", concat(lit("S"), key % 3))
    val tagKey = expr("cast(substring(property_id, 2) as long)")
    val tags = Quality.explodeTags(props, "id")
      .withColumn("is_solved", (length(col("name")) + tagKey) % 5 === 0)
      .withColumn("is_ignored", tagKey % 7 === 0)
    val listings = EtlQueries.currentListings(s, d)
      .select("url", "region", "tab")
    Quality.tagDetail(props, tags, listings, "no_bedrooms")
      .select("id", "url", "source", "title", "region", "tab")
  }

  /** §2.9 queue status write-back (queue_routes.py:61-117): re-check
    * statuses from this month's queue applied to unavailable listings;
    * multi-status urls resolve by the reference's last-loop-wins order.
    */
  def q58QueueWriteback(s: SparkSession, d: String): DataFrame = {
    val listings = Tables.orders(s, d).select(
      concat(lit("u"), k).as("url"),
      when(k % 4 === 0, "Sold").otherwise("Available").as("status"),
      (k % 4 =!= 0).as("is_available"))
    val queue = Tables.lineitem(s, d).select(
      concat(lit("u"), col("l_orderkey")).as("url"),
      when(col("l_returnflag") === "R", "Delisted")
        .when(col("l_returnflag") === "A", "Error")
        .otherwise("Available").as("status"),
      col("l_shipdate").as("updated_at"))
    Merge.queueStatusSync(listings, queue, "1998-06-01")
  }

  /** §2.1 upload→queue filter chain (data_routes.py:70-157): Available
    * rows only, null/non-http/blacklisted urls dropped (http:// without
    * the s never yields a domain — kept via the null-domain branch,
    * faithfully), anti-join against the queue, dedup.
    */
  def q62UploadQueue(s: SparkSession, d: String): DataFrame = {
    val lk = col("l_orderkey")
    val upload = Tables.lineitem(s, d).select(
      when(lk % 7 === 0, lit(null).cast("string"))
        .when(lk % 11 === 0,
          concat(lit("http://s9.x.com/p"), lk % 997))
        .when(lk % 5 === 0, concat(lit("ftp://bad/"), lk % 997))
        .otherwise(concat(lit("https://s"), col("l_suppkey") % 16,
          lit(".x.com/p"), lk % 997)).as("Property Link"),
      when(col("l_returnflag") === "N", "Available")
        .otherwise("Sold").as("Availability"))
    Sources.uploadQueueFilter(upload, queue(s, d), Seq("s3.x.com", "s7.x.com"))
      .orderBy("url")
  }

  /** §2.4 dashboard report totals (report-table.jsx:92-126): sums +
    * success-rate arithmetic, server-side.
    */
  def q63ReportTotals(s: SparkSession, d: String): DataFrame =
    Analytics.reportTotals(Tables.events(s, d).select(
      (col("event_id") % 100).as("success_count"),
      (col("event_id") % 100).as("total_listings"),
      (col("event_id") % 7).as("error_count"),
      (col("event_id") % 50).as("duration")))

  /** §2.8 required-field audit (local.py:4-44): per-row missing columns
    * with the conditional exemptions (leasehold_years only when
    * Leasehold, sold_at only when unavailable).
    */
  def q64MissingFields(s: SparkSession, d: String): DataFrame = {
    val rows = Tables.orders(s, d).select(
      concat(lit("p"), k).as("id"),
      when(k % 3 === 0, lit(null).cast("string")).otherwise("T").as("title"),
      when(k % 4 === 0, "").otherwise("L").as("location"),
      when(k % 2 === 0, "Leasehold").otherwise("Freehold").as("contract_type"),
      when(k % 5 === 0, lit(null).cast("double")).otherwise(25.0)
        .as("leasehold_years"),
      (k % 6 =!= 0).as("is_available"),
      when(k % 7 === 0, lit(null).cast("timestamp"))
        .otherwise(col("o_orderdate").cast("timestamp")).as("sold_at"))
    rows.select(col("id"),
      concat_ws(",", Quality.missingFields(rows,
        Seq("title", "location", "leasehold_years", "sold_at"))).as("missing"))
  }

  /** §2.8 off-plan flag + land-zoning classification (property.py:61-68,
    * 155-194): literal + normalized off-plan probes over title/desc/labels;
    * zoning-sentence color scan (incl. the green-shadows-dark-green
    * containment quirk) then category keywords, Land rows only.
    */
  def q65OffplanZoning(s: SparkSession, d: String): DataFrame = {
    val title = when(k % 5 === 0, "Off Plan Villa")
      .when(k % 5 === 1, "off-plan unit")
      .when(k % 5 === 2, "Off the plan paradise")
      .otherwise(lit("Villa"))
    val desc = concat(
      when(k % 7 === 0, "under construction now").otherwise(lit("plain")),
      lit("\n"),
      when(k % 3 === 0, "zoning: yellow area")
        .when(k % 3 === 1, "zoning: dark green land")
        .otherwise(lit("zoning for tourism")))
    val labels = when(k % 11 === 0, array(lit("OffPlan")))
      .otherwise(array(lit("For Sale")))
    val ptype = when(k % 2 === 0, "Land").otherwise("Villa")
    Tables.orders(s, d).select(
      concat(lit("p"), k).as("id"),
      Quality.checkOffPlan(title, desc, labels).as("is_off_plan"),
      Quality.defineLandZoning(ptype, desc).as("zoning"))
  }

  private def freshDir(name: String): String = {
    val dir = new java.io.File(s"/tmp/graft_sink_$name")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    if (dir.exists()) rm(dir)
    dir.getAbsolutePath
  }

  /** §2.1 constrained-append sink, gated END-TO-END: two batches with
    * overlapping + internally-duplicated keys go through the real
    * unique-key writer (models/error.py:6-16 semantics — dedup within
    * the batch, anti-join against what's on disk, append), then the
    * table is read back. Output = the key set, which the oracle states
    * as DISTINCT over both batches — byte-identical iff the writer
    * enforced the constraint across batches AND within each batch.
    */
  def q66ConstrainedAppend(s: SparkSession, d: String): DataFrame = {
    val path = freshDir("q66")
    // batch2 shifts odd keys onto batch1's EVEN residue space (odd k →
    // (k+1) % 700 is even) so the two batches genuinely collide — the
    // cross-batch anti-join must filter, and a regression there would
    // surface as duplicate read-back urls vs the DISTINCT oracle
    val batch1 = Tables.orders(s, d).filter(k % 2 === 0)
      .select(concat(lit("u"), k % 700).as("url"))
    val batch2 = Tables.orders(s, d).filter(k % 2 === 1)
      .select(concat(lit("u"), (k + 1) % 700).as("url"))
    Sinks.constrainedAppend(batch1, path, Seq("url"))
    Sinks.constrainedAppend(batch2, path, Seq("url"))
    s.read.parquet(path).select("url").orderBy("url")
  }

  /** §2.1 staging-append sink, gated end-to-end: rows go through the
    * real partitioned writer (property.py:38-66 semantics — month
    * derived from scraped_at, layout partitioned by (source, month)),
    * then read back WITH the partition columns, proving the month
    * derivation and that the partition layout round-trips values.
    */
  def q67StagingRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = freshDir("q67")
    val rows = Tables.orders(s, d).select(
      concat(lit("u"), k).as("url"),
      concat(lit("s"), k % 4).as("source"),
      col("o_orderdate").cast("timestamp").as("scraped_at"))
    Sinks.stagingAppend(rows, path)
    s.read.parquet(path)
      .select(col("url"), col("source"), col("month").cast("string"))
      .orderBy("url")
  }

  /** §2.6 queue pagination with filters (queue_routes.py:20-46), page 2. */
  def q49QueuePage(s: SparkSession, d: String): DataFrame =
    Analytics.queuePage(queue(s, d), Some("Available"), Some("s3.x.com"),
      Some("2024-01-10"), page = 2)

  /** §2.6 unique sorted domains (queue_routes.py:48-58). */
  def q50Domains(s: SparkSession, d: String): DataFrame =
    Analytics.domains(queue(s, d))

  /** §2.9 delist sync: current-table urls missing from the crawl flip to
    * Delisted with the first_month stamp.
    */
  def q51DelistSync(s: SparkSession, d: String): DataFrame =
    Merge.delistMissing(
      EtlQueries.currentListings(s, d),
      EtlQueries.incomingListings(s, d),
      LocalDate.of(2026, 8, 15))
      .select("url", "availability", "is_available", "sold_at")

  /** §2.4 monthly reid-bucket counts (analytics_routes.py:22-47) over the
    * synthesized listing table.
    */
  def q52MonthlyReid(s: SparkSession, d: String): DataFrame =
    Analytics.monthlyListingCounts(EtlQueries.currentListings(s, d))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q44_json_api" -> (q44JsonApi _),
    "q45_html_in_json" -> (q45HtmlInJson _),
    "q46_frontier_dedup" -> (q46FrontierDedup _),
    "q47_crawl_report" -> (q47CrawlReport _),
    "q48_tag_counts" -> (q48TagCounts _),
    "q49_queue_page" -> (q49QueuePage _),
    "q50_domains" -> (q50Domains _),
    "q51_delist_sync" -> (q51DelistSync _),
    "q52_monthly_reid" -> (q52MonthlyReid _),
    "q56_tag_mark" -> (q56TagMark _),
    "q57_tag_detail" -> (q57TagDetail _),
    "q58_queue_writeback" -> (q58QueueWriteback _),
    "q62_upload_queue" -> (q62UploadQueue _),
    "q63_report_totals" -> (q63ReportTotals _),
    "q64_missing_fields" -> (q64MissingFields _),
    "q65_offplan_zoning" -> (q65OffplanZoning _),
    "q66_constrained_append" -> (q66ConstrainedAppend _),
    "q67_staging_roundtrip" -> (q67StagingRoundtrip _))

  /** Shared oracle fragment: the 13-rule tag fan-out over the props
    * fixture (mirrors Quality.issueRules; used by q48/q56/q57).
    */
  private val tagsSql =
    """tags AS (
      |  SELECT 'has_more_than_13_bedrooms' AS name, key FROM t
      |    WHERE bedrooms IS NOT NULL AND bedrooms <> 0 AND bedrooms >= 13
      |  UNION ALL SELECT 'no_bedrooms', key FROM t
      |    WHERE (bedrooms IS NULL OR bedrooms = 0) AND ptype IS DISTINCT FROM 'Land'
      |  UNION ALL SELECT 'no_price', key FROM t WHERE price = 0
      |  UNION ALL SELECT 'no_title', key FROM t
      |    WHERE title IS NULL OR title = '' OR title = 'N/A'
      |  UNION ALL SELECT 'no_description', key FROM t
      |    WHERE description IS NULL OR description = ''
      |  UNION ALL SELECT 'no_location', key FROM t
      |    WHERE location IS NULL OR location = ''
      |  UNION ALL SELECT 'build_size_greater_than_land_size', key FROM t
      |    WHERE build_size IS NOT NULL AND build_size <> 0
      |      AND land_size IS NOT NULL AND land_size <> 0
      |      AND build_size > land_size
      |  UNION ALL SELECT 'no_leasehold_years', key FROM t
      |    WHERE contract = 'Leasehold' AND (lease IS NULL OR lease = 0)
      |  UNION ALL SELECT 'not_available', key FROM t
      |    WHERE avail IS DISTINCT FROM 'Available'
      |  UNION ALL SELECT 'unknown_property_type', key FROM t
      |    WHERE ptype IS NULL OR ptype NOT IN
      |      ('Villa','House','Land','Apartment','Hotel','Townhouse','Commercial','Loft')
      |  UNION ALL SELECT 'land_with_bedrooms', key FROM t
      |    WHERE ptype = 'Land' AND bedrooms IS NOT NULL AND bedrooms > 0
      |  UNION ALL SELECT 'unknown_contract_type', key FROM t
      |    WHERE contract IS NULL OR contract NOT IN ('Freehold','Leasehold','Rental')
      |  UNION ALL SELECT 'no_land_zoning', key FROM t
      |    WHERE ptype = 'Land' AND (zoning IS NULL OR zoning = ''))""".stripMargin

  private val queueSql =
    """q AS (
      |  SELECT event_id AS id,
      |    'https://s' || (user_id % 16) || '.x.com/p' || (event_id % 997) AS url,
      |    CASE WHEN event_id % 5 = 0 THEN 'Error'
      |         WHEN event_id % 5 = 1 THEN 'Delisted'
      |         WHEN event_id % 5 = 2 THEN 'Sold'
      |         ELSE 'Available' END AS status,
      |    ts AS created_at
      |  FROM events)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q44_json_api" ->
      """WITH p AS (
        |  SELECT '{"id": ' || event_id || ', "title": {"rendered": "Villa '
        |    || event_id || '"}, "price": ' || (event_id % 1000) * 100
        |    || ', "status": "publish"}' AS payload
        |  FROM events)
        |SELECT CAST(json_extract_string(payload, '$.id') AS BIGINT) AS item_id,
        |  json_extract_string(payload, '$.title.rendered') AS title,
        |  CAST(json_extract_string(payload, '$.price') AS BIGINT) AS price,
        |  json_extract_string(payload, '$.status') AS status
        |FROM p""".stripMargin,
    "q45_html_in_json" ->
      """WITH p AS (
        |  SELECT '{"content": "<div class=\"title\">T' || event_id
        |    || '</div> IDR ' || (event_id % 500) + 1 || '.000.000"}' AS envelope
        |  FROM events),
        |h AS (SELECT json_extract_string(envelope, '$.content') AS html FROM p)
        |SELECT
        |  CAST(replace(replace(
        |    NULLIF(regexp_extract(html, '(?i)IDR\s*([0-9.,]+)', 1), ''),
        |    '.', ''), ',', '') AS BIGINT) AS idr,
        |  NULLIF(regexp_extract(html, 'class="title">([^<]*)<', 1), '') AS title
        |FROM h""".stripMargin,
    "q46_frontier_dedup" -> (
      s"""WITH $queueSql,
         |u AS (SELECT DISTINCT url FROM q)
         |SELECT NULLIF(regexp_extract(url, 'http[s]://(.*?)/', 1), '') AS domain,
         |  count(*) AS n
         |FROM u GROUP BY 1 ORDER BY 1""".stripMargin),
    "q47_crawl_report" ->
      """WITH r AS (
        |  SELECT 'src' || (user_id % 16) AS source, ts AS created_at,
        |    event_id % 100 AS item_scraped_count,
        |    event_id % 7 AS response_error_count,
        |    event_id % 50 AS elapsed_time_seconds
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01')
        |SELECT source, created_at,
        |  item_scraped_count AS total_listings,
        |  item_scraped_count AS success_count,
        |  response_error_count AS error_count,
        |  elapsed_time_seconds AS duration
        |FROM (SELECT *, row_number() OVER (PARTITION BY source
        |        ORDER BY created_at DESC, item_scraped_count DESC,
        |        response_error_count DESC, elapsed_time_seconds DESC) AS rn
        |      FROM r) t
        |WHERE rn = 1""".stripMargin,
    "q48_tag_counts" -> (
      s"""WITH ${EtlQueries.propsFixtureSql},
         |$tagsSql
         |SELECT name, count(*) AS n FROM tags
         |WHERE NOT ((length(name) + key) % 5 = 0) AND NOT (key % 7 = 0)
         |GROUP BY name ORDER BY name""".stripMargin),
    "q56_tag_mark" -> (
      s"""WITH ${EtlQueries.propsFixtureSql},
         |$tagsSql,
         |f AS (
         |  SELECT name, key,
         |    (length(name) + key) % 5 = 0 AS s0,
         |    key % 7 = 0 AS i0
         |  FROM tags),
         |u AS (
         |  SELECT name,
         |    CASE WHEN key % 5 = 0 AND name = 'no_bedrooms'
         |         THEN true ELSE s0 END AS is_solved,
         |    CASE WHEN key % 5 = 0 AND name = 'no_bedrooms'
         |         THEN false ELSE i0 END AS is_ignored
         |  FROM f)
         |SELECT name, is_solved, is_ignored, count(*) AS n FROM u
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
    "q57_tag_detail" -> (
      s"""WITH ${EtlQueries.propsFixtureSql},
         |$tagsSql,
         |open AS (
         |  SELECT DISTINCT key FROM tags WHERE name = 'no_bedrooms'
         |    AND NOT ((length(name) + key) % 5 = 0) AND NOT (key % 7 = 0)),
         |p AS (
         |  SELECT 'p' || key AS id, 'u' || (key % 1200) AS url,
         |    'S' || (key % 3) AS source, title
         |  FROM t WHERE key IN (SELECT key FROM open)),
         |pg AS (SELECT * FROM p ORDER BY source, id LIMIT 50),
         |fo AS (
         |  SELECT *, row_number() OVER (PARTITION BY url
         |    ORDER BY source, id) AS rn
         |  FROM pg),
         |cur AS (
         |  SELECT 'u' || o_orderkey AS url, CAST(NULL AS VARCHAR) AS region,
         |    CASE WHEN o_orderkey % 4 = 0 THEN 'ALL LAND' ELSE 'DATA' END AS tab
         |  FROM orders WHERE o_orderkey % 10 < 8)
         |SELECT fo.id, fo.url, fo.source, fo.title, cur.region, cur.tab
         |FROM fo LEFT JOIN cur ON fo.url = cur.url
         |WHERE rn = 1""".stripMargin),
    "q58_queue_writeback" ->
      """WITH l AS (
        |  SELECT 'u' || o_orderkey AS url,
        |    CASE WHEN o_orderkey % 4 = 0 THEN 'Sold' ELSE 'Available' END AS status,
        |    o_orderkey % 4 <> 0 AS is_available
        |  FROM orders),
        |r AS (
        |  SELECT 'u' || l_orderkey AS url,
        |    CASE WHEN l_returnflag = 'R' THEN 'Delisted'
        |         WHEN l_returnflag = 'A' THEN 'Error'
        |         ELSE 'Available' END AS status
        |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-06-01'),
        |s AS (
        |  SELECT l.url, l.status AS old_status, l.is_available,
        |    l.url IN (SELECT url FROM r WHERE status = 'Available') AS ina,
        |    l.url IN (SELECT url FROM r WHERE status = 'Error') AS ine,
        |    l.url IN (SELECT url FROM r WHERE status = 'Delisted') AS ind
        |  FROM l)
        |SELECT url,
        |  CASE WHEN NOT is_available AND ina THEN 'Available'
        |       WHEN NOT is_available AND ine THEN 'Error'
        |       WHEN NOT is_available AND ind THEN 'Delisted'
        |       ELSE old_status END AS status,
        |  CASE WHEN NOT is_available AND (ina OR ine OR ind)
        |       THEN (CASE WHEN ina THEN 'Available'
        |                  WHEN ine THEN 'Error'
        |                  ELSE 'Delisted' END) = 'Available'
        |       ELSE is_available END AS is_available
        |FROM s""".stripMargin,
    "q49_queue_page" -> (
      s"""WITH $queueSql
         |SELECT id, url, created_at FROM q
         |WHERE status = 'Available' AND contains(url, 's3.x.com')
         |  AND created_at >= TIMESTAMP '2024-01-10'
         |ORDER BY created_at DESC, id DESC LIMIT 50 OFFSET 50""".stripMargin),
    "q50_domains" -> (
      s"""WITH $queueSql
         |SELECT DISTINCT NULLIF(regexp_extract(url, 'http[s]://(.*?)/', 1), '')
         |  AS domain
         |FROM q WHERE NULLIF(regexp_extract(url, 'http[s]://(.*?)/', 1), '')
         |  IS NOT NULL
         |ORDER BY 1""".stripMargin),
    "q51_delist_sync" ->
      """WITH cur AS (
        |  SELECT 'u' || o_orderkey AS url FROM orders WHERE o_orderkey % 10 < 8),
        |crawled AS (
        |  SELECT 'u' || o_orderkey AS url FROM orders WHERE o_orderkey % 10 >= 2)
        |SELECT url, 'Delisted' AS availability, false AS is_available,
        |  TIMESTAMP '2026-07-01' AS sold_at
        |FROM cur WHERE url NOT IN (SELECT url FROM crawled)""".stripMargin,
    "q52_monthly_reid" ->
      """SELECT '2026-07-01' AS date, count(*) AS n
        |FROM orders WHERE o_orderkey % 10 < 8""".stripMargin,
    "q62_upload_queue" -> (
      s"""WITH $queueSql,
         |u AS (
         |  SELECT CASE WHEN l_orderkey % 7 = 0 THEN NULL
         |         WHEN l_orderkey % 11 = 0
         |           THEN 'http://s9.x.com/p' || (l_orderkey % 997)
         |         WHEN l_orderkey % 5 = 0
         |           THEN 'ftp://bad/' || (l_orderkey % 997)
         |         ELSE 'https://s' || (l_suppkey % 16) || '.x.com/p'
         |           || (l_orderkey % 997) END AS url,
         |    CASE WHEN l_returnflag = 'N' THEN 'Available'
         |         ELSE 'Sold' END AS avail
         |  FROM lineitem),
         |f AS (
         |  SELECT DISTINCT url FROM u
         |  WHERE avail = 'Available' AND url IS NOT NULL
         |    AND url LIKE 'http%'
         |    AND (NULLIF(regexp_extract(url, 'http[s]://(.*?)/', 1), '')
         |           NOT IN ('s3.x.com', 's7.x.com')
         |         OR NULLIF(regexp_extract(url, 'http[s]://(.*?)/', 1), '')
         |           IS NULL))
         |SELECT url FROM f WHERE url NOT IN (SELECT url FROM q)
         |ORDER BY url""".stripMargin),
    "q63_report_totals" ->
      """WITH r AS (
        |  SELECT CAST(sum(event_id % 100) AS BIGINT) AS sum_success,
        |    CAST(sum(event_id % 100) AS BIGINT) AS sum_listings,
        |    CAST(sum(event_id % 7) AS BIGINT) AS sum_errors,
        |    CAST(sum(event_id % 50) AS BIGINT) AS sum_duration
        |  FROM events)
        |SELECT sum_success, sum_listings, sum_errors, sum_duration,
        |  sum_success * 100.0 / (sum_listings + sum_errors) AS success_rate
        |FROM r""".stripMargin,
    "q64_missing_fields" ->
      """SELECT 'p' || o_orderkey AS id,
        |  coalesce(array_to_string(list_filter([
        |    CASE WHEN o_orderkey % 3 = 0 THEN 'title' END,
        |    CASE WHEN o_orderkey % 4 = 0 THEN 'location' END,
        |    CASE WHEN o_orderkey % 2 = 0 AND o_orderkey % 5 = 0
        |         THEN 'leasehold_years' END,
        |    CASE WHEN o_orderkey % 6 = 0 AND o_orderkey % 7 = 0
        |         THEN 'sold_at' END],
        |    x -> x IS NOT NULL), ','), '') AS missing
        |FROM orders""".stripMargin,
    "q65_offplan_zoning" ->
      """SELECT 'p' || o_orderkey AS id,
        |  (o_orderkey % 5 IN (0, 1, 2)) OR o_orderkey % 7 = 0
        |    OR o_orderkey % 11 = 0 AS is_off_plan,
        |  CASE WHEN o_orderkey % 2 = 0 THEN
        |    CASE WHEN o_orderkey % 3 = 0 THEN 'Residential'
        |         WHEN o_orderkey % 3 = 1 THEN 'Agricultural'
        |         ELSE 'Tourism' END END AS zoning
        |FROM orders""".stripMargin,
    "q66_constrained_append" ->
      """SELECT DISTINCT
        |  CASE WHEN o_orderkey % 2 = 0 THEN 'u' || (o_orderkey % 700)
        |       ELSE 'u' || ((o_orderkey + 1) % 700) END AS url
        |FROM orders ORDER BY url""".stripMargin,
    "q67_staging_roundtrip" ->
      """SELECT 'u' || o_orderkey AS url, 's' || (o_orderkey % 4) AS source,
        |  strftime(o_orderdate, '%Y-%m') AS month
        |FROM orders ORDER BY url""".stripMargin)
}
