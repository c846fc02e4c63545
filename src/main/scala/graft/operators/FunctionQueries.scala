package graft

import graft.functions.Cleaners
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness queries exercising the scalar function library (SURVEY §2.7)
  * against the DuckDB oracle. Inputs are deterministic strings constructed
  * from testdata columns so both engines parse identical text; every
  * function used here is the Column-expression (codegen) form whose
  * semantics CleanersSpec already pins to the Parse kernel.
  */
object FunctionQueries {

  /** §2.1 JSON-embedded source (reference raywhite.py:68-90 jmespath over
    * ld+json → get_json_object). Scales as a plain scan+agg; JSON path
    * evaluation is per-row, no shuffle added.
    */
  def q23JsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("value"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"),
        Relational.moneySum(col("value"), 2).as("sum_value"))
      .orderBy("k")

  private def priceText(s: SparkSession, d: String) =
    Tables.orders(s, d).withColumn("txt",
      when(col("o_orderkey") % 4 === 0,
        concat(lit("IDR "), col("o_orderkey").cast("string")))
        .when(col("o_orderkey") % 4 === 1,
          concat(lit("USD "), col("o_orderkey").cast("string")))
        .when(col("o_orderkey") % 4 === 2,
          concat(lit("Rp "), col("o_orderkey").cast("string")))
        .otherwise(lit("price request")))

  /** §2.7 currency/price parsing: identify_currency (reid/func.py:919-925),
    * find_idr/find_usd (:40-61), price_request_to_zero (:266-269) over
    * deterministic price strings.
    */
  def q24CurrencyParse(s: SparkSession, d: String): DataFrame =
    priceText(s, d).select(
      col("o_orderkey"),
      Cleaners.identifyCurrency(col("txt")).as("currency"),
      Cleaners.findIdr(col("txt")).as("idr"),
      Cleaners.findUsd(col("txt")).as("usd"),
      Cleaners.priceRequestToZero(col("txt")).as("zeroed"))

  /** §2.7 categorical ladders: standardize_property_type
    * (reid/func.py:849-867) + get_contract_type (:380-383) as when-ladders,
    * aggregated so the oracle compares the full distribution.
    */
  def q25TypeLadder(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .withColumn("txt",
        when(col("p_partkey") % 6 === 0, concat(col("p_type"), lit(" villa for Sale")))
          .when(col("p_partkey") % 6 === 1, concat(lit("land plot "), col("p_type")))
          .when(col("p_partkey") % 6 === 2, lit("TOWNHOUSE unit"))
          .when(col("p_partkey") % 6 === 3, lit("modern home"))
          .when(col("p_partkey") % 6 === 4, concat(lit("Hotel "), col("p_brand")))
          .otherwise(col("p_type")))
      .withColumn("ctxt",
        when(col("p_size") % 2 === 0, lit("LEASEHOLD property"))
          .otherwise(lit("unknown tenure")))
      .select(Cleaners.standardizePropertyType(col("txt")).as("ptype"),
        Cleaners.getContractType(col("ctxt")).as("contract"))
      .groupBy("ptype", "contract")
      .agg(count(lit(1)).as("n"))
      .orderBy("ptype", "contract")

  /** §2.7 find_bedrooms (reid/func.py:760-764) + find_location_in_title
    * (:365-369) on constructed listing titles.
    */
  def q26BedroomsExtract(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .withColumn("txt",
        when(col("p_size") % 3 === 0, lit("cozy villa with pool"))
          .otherwise(concat(lit("Stunning "), (col("p_size") % 15).cast("string"),
            lit(" bedroom villa in Ubud"))))
      .select(col("p_partkey"),
        Cleaners.findBedrooms(col("txt")).as("beds"),
        Cleaners.findLocationInTitle(col("txt")).as("loc"))

  /** §2.7 get_domain (reid/func.py:35-37) over constructed URLs, grouped
    * per domain (reference queue_routes.py:53-58 unique-domains shape).
    */
  def q27DomainExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("url", concat(lit("https://src"),
        (col("user_id") % 16).cast("string"), lit(".example.com/e/"),
        col("event_id").cast("string")))
      .select(Cleaners.getDomain(col("url")).as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n"))
      .orderBy("domain")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_json_extract" -> (q23JsonExtract _),
    "q24_currency_parse" -> (q24CurrencyParse _),
    "q25_type_ladder" -> (q25TypeLadder _),
    "q26_bedrooms_extract" -> (q26BedroomsExtract _),
    "q27_domain_extract" -> (q27DomainExtract _))

  val oracle: Map[String, String] = Map(
    "q23_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value * 100.0) AS DECIMAL(38,0))) AS DOUBLE) / 100.0 AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q24_currency_parse" ->
      """WITH t AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 4 = 0 THEN 'IDR ' || CAST(o_orderkey AS VARCHAR)
        |         WHEN o_orderkey % 4 = 1 THEN 'USD ' || CAST(o_orderkey AS VARCHAR)
        |         WHEN o_orderkey % 4 = 2 THEN 'Rp ' || CAST(o_orderkey AS VARCHAR)
        |         ELSE 'price request' END AS txt
        |  FROM orders),
        |g AS (
        |  SELECT o_orderkey, txt,
        |    NULLIF(regexp_extract(txt, '(?i)IDR\s*([0-9.,]+)', 1), '') AS gi,
        |    replace(NULLIF(regexp_extract(txt, '(?i)USD\s*([0-9.,]+)', 1), ''), ',', '') AS gu
        |  FROM t)
        |SELECT o_orderkey,
        |  CASE WHEN regexp_matches(txt, '(?i)\bIDR\b|\bRp\b|\bIDR\d+') THEN 'IDR'
        |       WHEN regexp_matches(txt, '(?i)\bUSD\b|\bUSD\d+') THEN 'USD' END AS currency,
        |  CAST(replace(replace(gi, '.', ''), ',', '') AS BIGINT) AS idr,
        |  CAST(CASE WHEN regexp_matches(gu, '^\d+$') THEN gu
        |            ELSE NULLIF(replace(gu, '.', ''), '') END AS BIGINT) AS usd,
        |  CASE WHEN contains(lower(txt), 'price request') THEN '0' ELSE txt END AS zeroed
        |FROM g""".stripMargin,
    "q25_type_ladder" ->
      """WITH t AS (
        |  SELECT CASE WHEN p_partkey % 6 = 0 THEN p_type || ' villa for Sale'
        |              WHEN p_partkey % 6 = 1 THEN 'land plot ' || p_type
        |              WHEN p_partkey % 6 = 2 THEN 'TOWNHOUSE unit'
        |              WHEN p_partkey % 6 = 3 THEN 'modern home'
        |              WHEN p_partkey % 6 = 4 THEN 'Hotel ' || p_brand
        |              ELSE p_type END AS txt,
        |    CASE WHEN p_size % 2 = 0 THEN 'LEASEHOLD property'
        |         ELSE 'unknown tenure' END AS ctxt
        |  FROM part)
        |SELECT replace(
        |  CASE WHEN regexp_matches(txt, '(?i)land') THEN 'Land'
        |       WHEN regexp_matches(txt, '(?i)townhouse') THEN 'Townhouse'
        |       WHEN regexp_matches(txt, '(?i)house|home') THEN 'House'
        |       WHEN regexp_matches(txt, '(?i)apartment|apartement') THEN 'Apartment'
        |       WHEN regexp_matches(txt, '(?i)commercial') THEN 'Commercial'
        |       WHEN regexp_matches(txt, '(?i)^hotel') THEN 'Hotel'
        |       WHEN regexp_matches(txt, '(?i)villa') THEN 'Villa'
        |       ELSE txt END, ' for Sale', '') AS ptype,
        |  CASE WHEN regexp_matches(lower(ctxt), 'leasehold|freehold')
        |       THEN upper(substr(regexp_extract(lower(ctxt), 'leasehold|freehold', 0), 1, 1))
        |            || substr(regexp_extract(lower(ctxt), 'leasehold|freehold', 0), 2)
        |       ELSE 'Freehold' END AS contract,
        |  count(*) AS n
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q26_bedrooms_extract" ->
      """WITH t AS (
        |  SELECT p_partkey,
        |    CASE WHEN p_size % 3 = 0 THEN 'cozy villa with pool'
        |         ELSE 'Stunning ' || CAST(p_size % 15 AS VARCHAR)
        |              || ' bedroom villa in Ubud' END AS txt
        |  FROM part)
        |SELECT p_partkey,
        |  CAST(NULLIF(regexp_extract(txt, '(?i)(\d{1,2}) bedroom(s?)', 1), '') AS INT) AS beds,
        |  NULLIF(regexp_extract(txt, '(?i)in (\w+)', 1), '') AS loc
        |FROM t""".stripMargin,
    "q27_domain_extract" ->
      """WITH t AS (
        |  SELECT 'https://src' || CAST(user_id % 16 AS VARCHAR)
        |         || '.example.com/e/' || CAST(event_id AS VARCHAR) AS url
        |  FROM events)
        |SELECT NULLIF(regexp_extract(url, 'http[s]://(.*?)/', 1), '') AS domain,
        |  count(*) AS n
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin)
}
