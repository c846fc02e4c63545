package graft

import java.time.LocalDate
import graft.functions.Cleaners
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable queries for the ETL write path (SURVEY §2.8/§2.9):
  * the MERGE rule matrix, the quality-rule tag fan-out and the wide
  * export, each run over listing-shaped frames synthesized
  * deterministically from `orders` so the DuckDB oracle can reproduce the
  * exact rule arithmetic.
  */
object EtlQueries {

  private[graft] val asOf = LocalDate.of(2026, 8, 15)

  private def k = col("o_orderkey")

  /** Current listing table: 80% of orders (o_orderkey % 10 < 8). */
  def currentListings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(k % 3).orderBy(k)
    Tables.orders(s, d).filter(k % 10 < 8).select(
      concat(lit("u"), k).as("url"),
      concat(lit("S"), (k % 3)).as("source"),
      format_string("REID_26_07_S%d_%03d", k % 3, row_number().over(w)).as("reid_id"),
      lit("t").as("title"),
      lit(null).cast("string").as("region"),
      lit("2026-07-15").cast("timestamp").as("scraped_at"),
      lit("2026-07-15").cast("timestamp").as("created_at"),
      lit("2026-07-15").cast("timestamp").as("updated_at"),
      when(k % 4 === 0, "ALL LAND").otherwise("DATA").as("tab"),
      when(k % 7 === 0, 0L).otherwise(floor(col("o_totalprice")).cast("long")).as("price"),
      when(k % 2 === 0, "IDR").otherwise("USD").as("currency"),
      lit("Available").as("availability"),
      lit(true).as("is_available"),
      lit(false).as("is_off_plan"),
      lit("img").as("image_url"),
      lit("d").as("description"),
      when(k % 3 === 0, "").otherwise(concat(lit("loc"), (k % 3))).as("location"),
      when(k % 5 === 0, lit(null)).otherwise((k % 5) * 10.0).as("leasehold_years"),
      lit("Freehold").as("contract_type"),
      when(k % 4 === 0, "Land").otherwise("Villa").as("property_type"),
      lit(2.0).as("bedrooms"),
      lit(1.0).as("bathrooms"),
      lit(null).cast("double").as("build_size"),
      lit(null).cast("double").as("land_size"),
      lit(null).cast("string").as("land_zoning"),
      lit(null).cast("string").as("property_id"),
      lit(null).cast("string").as("listed_date"),
      lit(null).cast("timestamp").as("sold_at"))
  }

  /** Incoming crawl: orders with o_orderkey % 10 >= 2 — overlaps 2..7 with
    * the current table, 8..9 are brand-new urls.
    */
  def incomingListings(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).filter(k % 10 >= 2).select(
      concat(lit("u"), k).as("url"),
      concat(lit("S"), (k % 3)).as("source"),
      lit(null).cast("string").as("reid_id"),
      lit("t").as("title"),
      lit(null).cast("string").as("region"),
      lit("2026-08-01").cast("timestamp").as("scraped_at"),
      lit("2026-08-15").cast("timestamp").as("created_at"),
      lit("2026-08-15").cast("timestamp").as("updated_at"),
      lit("DATA").as("tab"),
      when(k % 11 === 0, -1L)
        .when(k % 13 === 0, 0L)
        .otherwise(floor(col("o_totalprice")).cast("long") + 1000).as("price"),
      when(k % 2 === 0, "IDR").otherwise("USD").as("currency"),
      when(k % 17 === 0, "Sold")
        .when(k % 19 === 0, "Delisted")
        .otherwise("Available").as("availability"),
      (!(k % 17 === 0) && !(k % 19 === 0)).as("is_available"),
      lit(false).as("is_off_plan"),
      lit("img").as("image_url"),
      lit("d").as("description"),
      when(k % 6 === 0, "newloc").otherwise("").as("location"),
      when(k % 5 === 1, lit(null)).otherwise((k % 5) * 10.0 + 5).as("leasehold_years"),
      lit("Freehold").as("contract_type"),
      when(k % 4 === 0, "Land").otherwise("Villa").as("property_type"),
      lit(2.0).as("bedrooms"),
      lit(1.0).as("bathrooms"),
      lit(null).cast("double").as("build_size"),
      lit(null).cast("double").as("land_size"),
      lit(null).cast("string").as("land_zoning"),
      lit(null).cast("string").as("property_id"),
      lit(null).cast("string").as("listed_date"),
      lit(null).cast("timestamp").as("sold_at"))

  /** §2.8/§2.9 the full upsert: compare rules + change log + reid_id
    * sequencing for new urls + post-merge sold_at imputation
    * (fill_missing_sold_at.py:7-27).
    */
  def q28MergeUpsert(s: SparkSession, d: String): DataFrame =
    Merge.merge(currentListings(s, d), incomingListings(s, d), asOf)
      .select(col("url"), col("reid_id"), col("price"), col("currency"),
        col("availability"), col("is_available"),
        col("leasehold_years"), col("location"), col("tab"),
        Cleaners.imputeSoldAt(col("sold_at"), col("is_available"),
          col("updated_at")).cast("timestamp").as("sold_at"),
        size(col("changes")).as("n_changes"),
        col("is_new"))

  /** Shared property-staging fixture for the quality-rule queries (q29
    * here, q48 tag counts) — one definition so the Spark side and both
    * oracles cannot drift apart.
    */
  def propsFixture(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      concat(lit("p"), k).as("id"),
      when(k % 14 === 0, lit(null))
        .when(k % 15 === 0, 14.0)
        .otherwise((k % 5).cast("double")).as("bedrooms"),
      when(k % 4 === 0, "Land")
        .when(k % 9 === 0, "Castle")
        .otherwise("Villa").as("property_type"),
      when(k % 7 === 0, 0L).otherwise(100L).as("price"),
      when(k % 8 === 0, "N/A").otherwise("t").as("title"),
      when(k % 10 === 0, "").otherwise("d").as("description"),
      when(k % 12 === 0, lit(null)).otherwise(lit("loc")).as("location"),
      when(k % 6 === 0, 300.0).otherwise(lit(null)).as("build_size"),
      when(k % 6 === 0, 200.0).otherwise(lit(null)).as("land_size"),
      when(k % 3 === 0, "Leasehold")
        .when(k % 16 === 0, "Timeshare")
        .otherwise("Freehold").as("contract_type"),
      when(k % 21 === 0, 25.0).otherwise(lit(null)).as("leasehold_years"),
      when(k % 17 === 0, "Sold").otherwise("Available").as("availability"),
      when(k % 24 === 0, "Residential").otherwise(lit(null)).as("land_zoning"))

  /** §2.8 identify_issues tag fan-out + tag counts
    * (models/property.py:70-138 + tag_routes.py:24-40).
    */
  def q29IssueTags(s: SparkSession, d: String): DataFrame =
    Quality.explodeTags(propsFixture(s, d), "id")
      .groupBy("name").agg(count(lit(1)).as("n"))
      .orderBy("name")

  /** §2.8 to_dict wide export (models/listing.py:175-241) over listings
    * with a Delisted/Sold mix and both currencies.
    */
  def q30ExportWide(s: SparkSession, d: String): DataFrame = {
    val base = currentListings(s, d).withColumn("okey",
      expr("cast(substring(url, 2) as long)"))
    Export.toDict(
      base
        .withColumn("availability",
          when(col("okey") % 23 === 0, "Delisted")
            .when(col("okey") % 29 === 0, "Sold")
            .otherwise("Available"))
        .withColumn("sold_at",
          when(col("okey") % 23 === 0 || col("okey") % 29 === 0,
            lit("2026-06-01").cast("timestamp")))
        .withColumn("is_off_plan", col("okey") % 31 === 0))
      .select("property_link", "reid_id", "source_a", "price_idr", "price_usd",
        "availability", "site_status", "sold_date_ms", "scrape_date_ms",
        "off_plan", "years", "location")
  }

  /** DuckDB twin of [[propsFixture]] — single source for q29/q48 oracles. */
  val propsFixtureSql: String =
    """t AS (
      |  SELECT o_orderkey AS key,
      |    CASE WHEN o_orderkey % 14 = 0 THEN NULL
      |         WHEN o_orderkey % 15 = 0 THEN 14.0
      |         ELSE CAST(o_orderkey % 5 AS DOUBLE) END AS bedrooms,
      |    CASE WHEN o_orderkey % 4 = 0 THEN 'Land'
      |         WHEN o_orderkey % 9 = 0 THEN 'Castle'
      |         ELSE 'Villa' END AS ptype,
      |    CASE WHEN o_orderkey % 7 = 0 THEN 0 ELSE 100 END AS price,
      |    CASE WHEN o_orderkey % 8 = 0 THEN 'N/A' ELSE 't' END AS title,
      |    CASE WHEN o_orderkey % 10 = 0 THEN '' ELSE 'd' END AS description,
      |    CASE WHEN o_orderkey % 12 = 0 THEN NULL ELSE 'loc' END AS location,
      |    CASE WHEN o_orderkey % 6 = 0 THEN 300.0 END AS build_size,
      |    CASE WHEN o_orderkey % 6 = 0 THEN 200.0 END AS land_size,
      |    CASE WHEN o_orderkey % 3 = 0 THEN 'Leasehold'
      |         WHEN o_orderkey % 16 = 0 THEN 'Timeshare'
      |         ELSE 'Freehold' END AS contract,
      |    CASE WHEN o_orderkey % 21 = 0 THEN 25.0 END AS lease,
      |    CASE WHEN o_orderkey % 17 = 0 THEN 'Sold' ELSE 'Available' END AS avail,
      |    CASE WHEN o_orderkey % 24 = 0 THEN 'Residential' END AS zoning
      |  FROM orders)""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_merge_upsert" -> (q28MergeUpsert _),
    "q29_issue_tags" -> (q29IssueTags _),
    "q30_export_wide" -> (q30ExportWide _))

  val oracle: Map[String, String] = Map(
    "q28_merge_upsert" ->
      """WITH ks AS (
        |  SELECT o_orderkey AS key, CAST(floor(o_totalprice) AS BIGINT) AS p
        |  FROM orders),
        |cur AS (
        |  SELECT key, 'u' || key AS url, 'S' || (key % 3) AS source,
        |    'REID_26_07_S' || (key % 3) || '_' ||
        |      printf('%03d', row_number() OVER (PARTITION BY key % 3 ORDER BY key)) AS reid_id,
        |    CASE WHEN key % 7 = 0 THEN 0 ELSE p END AS price,
        |    CASE WHEN key % 2 = 0 THEN 'IDR' ELSE 'USD' END AS currency,
        |    CASE WHEN key % 3 = 0 THEN '' ELSE 'loc' || (key % 3) END AS location,
        |    CASE WHEN key % 5 = 0 THEN NULL ELSE (key % 5) * 10.0 END AS lease,
        |    CASE WHEN key % 4 = 0 THEN 'Land' ELSE 'Villa' END AS ptype
        |  FROM ks WHERE key % 10 < 8),
        |inc AS (
        |  SELECT key, 'u' || key AS url, 'S' || (key % 3) AS source,
        |    CASE WHEN key % 11 = 0 THEN -1 WHEN key % 13 = 0 THEN 0
        |         ELSE p + 1000 END AS price,
        |    CASE WHEN key % 2 = 0 THEN 'IDR' ELSE 'USD' END AS currency,
        |    CASE WHEN key % 17 = 0 THEN 'Sold' WHEN key % 19 = 0 THEN 'Delisted'
        |         ELSE 'Available' END AS avail,
        |    CASE WHEN key % 6 = 0 THEN 'newloc' ELSE '' END AS location,
        |    CASE WHEN key % 5 = 1 THEN NULL ELSE (key % 5) * 10.0 + 5 END AS lease,
        |    CASE WHEN key % 4 = 0 THEN 'Land' ELSE 'Villa' END AS ptype
        |  FROM ks WHERE key % 10 >= 2),
        |maxes AS (SELECT source, count(*) AS max_idx FROM cur GROUP BY 1),
        |matched AS (
        |  SELECT c.url, c.reid_id,
        |    CASE WHEN i.price IN (-1, 0) THEN c.price ELSE i.price END AS price,
        |    c.currency,
        |    'Available' AS availability,
        |    NOT (i.avail <> 'Available') AS is_available,
        |    i.lease AS leasehold_years,
        |    CASE WHEN i.location = 'newloc' THEN 'newloc' ELSE c.location END AS location,
        |    CASE WHEN c.ptype = 'Land' THEN 'ALL LAND' ELSE 'DATA' END AS tab,
        |    CASE WHEN i.avail <> 'Available' THEN TIMESTAMP '2026-07-01' END AS sold_at,
        |    (CASE WHEN i.price IN (-1, 0) THEN 0 ELSE 1 END
        |     + CASE WHEN i.avail <> 'Available' THEN 2 ELSE 0 END
        |     + 1
        |     + CASE WHEN i.location = 'newloc' THEN 1 ELSE 0 END) AS n_changes,
        |    false AS is_new
        |  FROM cur c JOIN inc i USING (url)),
        |cur_only AS (
        |  SELECT url, reid_id, price, currency, 'Available' AS availability,
        |    true AS is_available, lease AS leasehold_years, location,
        |    CASE WHEN ptype = 'Land' THEN 'ALL LAND' ELSE 'DATA' END AS tab,
        |    CAST(NULL AS TIMESTAMP) AS sold_at, 0 AS n_changes, false AS is_new
        |  FROM cur WHERE key % 10 < 2),
        |new_only AS (
        |  SELECT i.url,
        |    'REID_26_07_' || i.source || '_' ||
        |      printf('%03d', m.max_idx +
        |        row_number() OVER (PARTITION BY i.source ORDER BY i.url)) AS reid_id,
        |    i.price, i.currency, i.avail AS availability,
        |    i.avail = 'Available' AS is_available,
        |    i.lease AS leasehold_years, i.location,
        |    CASE WHEN i.ptype = 'Land' THEN 'ALL LAND' ELSE 'DATA' END AS tab,
        |    CASE WHEN i.avail <> 'Available' THEN TIMESTAMP '2026-07-01' END AS sold_at,
        |    0 AS n_changes, true AS is_new
        |  FROM inc i JOIN maxes m USING (source) WHERE i.key % 10 >= 8)
        |SELECT url, reid_id, price, currency, availability, is_available,
        |  leasehold_years, location, tab, sold_at, n_changes, is_new
        |FROM matched
        |UNION ALL SELECT * FROM cur_only
        |UNION ALL SELECT * FROM new_only""".stripMargin,
    "q29_issue_tags" -> (
      s"""WITH $propsFixtureSql,
         |counts AS (
        |  SELECT 'has_more_than_13_bedrooms' AS name,
        |    count(CASE WHEN bedrooms IS NOT NULL AND bedrooms <> 0 AND bedrooms >= 13 THEN 1 END) AS n FROM t
        |  UNION ALL SELECT 'no_bedrooms',
        |    count(CASE WHEN (bedrooms IS NULL OR bedrooms = 0)
        |               AND ptype IS DISTINCT FROM 'Land' THEN 1 END) FROM t
        |  UNION ALL SELECT 'no_price', count(CASE WHEN price = 0 THEN 1 END) FROM t
        |  UNION ALL SELECT 'no_title',
        |    count(CASE WHEN title IS NULL OR title = '' OR title = 'N/A' THEN 1 END) FROM t
        |  UNION ALL SELECT 'no_description',
        |    count(CASE WHEN description IS NULL OR description = '' THEN 1 END) FROM t
        |  UNION ALL SELECT 'no_location',
        |    count(CASE WHEN location IS NULL OR location = '' THEN 1 END) FROM t
        |  UNION ALL SELECT 'build_size_greater_than_land_size',
        |    count(CASE WHEN build_size IS NOT NULL AND build_size <> 0
        |               AND land_size IS NOT NULL AND land_size <> 0
        |               AND build_size > land_size THEN 1 END) FROM t
        |  UNION ALL SELECT 'no_leasehold_years',
        |    count(CASE WHEN contract = 'Leasehold'
        |               AND (lease IS NULL OR lease = 0) THEN 1 END) FROM t
        |  UNION ALL SELECT 'not_available',
        |    count(CASE WHEN avail IS DISTINCT FROM 'Available' THEN 1 END) FROM t
        |  UNION ALL SELECT 'unknown_property_type',
        |    count(CASE WHEN ptype IS NULL OR ptype NOT IN
        |      ('Villa','House','Land','Apartment','Hotel','Townhouse','Commercial','Loft')
        |      THEN 1 END) FROM t
        |  UNION ALL SELECT 'land_with_bedrooms',
        |    count(CASE WHEN ptype = 'Land' AND bedrooms IS NOT NULL
        |               AND bedrooms > 0 THEN 1 END) FROM t
        |  UNION ALL SELECT 'unknown_contract_type',
        |    count(CASE WHEN contract IS NULL OR contract NOT IN
        |      ('Freehold','Leasehold','Rental') THEN 1 END) FROM t
        |  UNION ALL SELECT 'no_land_zoning',
        |    count(CASE WHEN ptype = 'Land' AND (zoning IS NULL OR zoning = '')
        |          THEN 1 END) FROM t)
        |SELECT name, n FROM counts WHERE n > 0 ORDER BY name""".stripMargin),
    "q30_export_wide" ->
      """WITH ks AS (
        |  SELECT o_orderkey AS key, CAST(floor(o_totalprice) AS BIGINT) AS p
        |  FROM orders WHERE o_orderkey % 10 < 8),
        |cur AS (
        |  SELECT key, 'u' || key AS url, 'S' || (key % 3) AS source,
        |    'REID_26_07_S' || (key % 3) || '_' ||
        |      printf('%03d', row_number() OVER (PARTITION BY key % 3 ORDER BY key)) AS reid_id,
        |    CASE WHEN key % 7 = 0 THEN 0 ELSE p END AS price,
        |    CASE WHEN key % 2 = 0 THEN 'IDR' ELSE 'USD' END AS currency,
        |    CASE WHEN key % 3 = 0 THEN '' ELSE 'loc' || (key % 3) END AS location,
        |    CASE WHEN key % 5 = 0 THEN NULL ELSE (key % 5) * 10.0 END AS lease,
        |    CASE WHEN key % 23 = 0 THEN 'Delisted'
        |         WHEN key % 29 = 0 THEN 'Sold' ELSE 'Available' END AS avail,
        |    CASE WHEN key % 23 = 0 OR key % 29 = 0
        |         THEN TIMESTAMP '2026-06-01' END AS sold_at,
        |    key % 31 = 0 AS offp
        |  FROM ks)
        |SELECT url AS property_link, reid_id, source AS source_a,
        |  CASE WHEN currency = 'IDR' THEN price END AS price_idr,
        |  CASE WHEN currency = 'USD' THEN price END AS price_usd,
        |  CASE WHEN avail = 'Delisted' THEN 'Sold' ELSE avail END AS availability,
        |  CASE WHEN avail = 'Delisted' THEN 'Delisted' END AS site_status,
        |  CAST(epoch_ms(sold_at) AS BIGINT) AS sold_date_ms,
        |  CAST(epoch_ms(TIMESTAMP '2026-07-15') AS BIGINT) AS scrape_date_ms,
        |  CASE WHEN offp THEN 'Yes' ELSE 'No' END AS off_plan,
        |  lease AS years, location
        |FROM cur""".stripMargin)
}
