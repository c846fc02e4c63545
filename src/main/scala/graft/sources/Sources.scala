package graft.sources

import graft.functions.Cleaners
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source connectors (SURVEY §2.1): the reference's acquisition variants
  * re-expressed as declarative parses over snapshot columns — JSON-API
  * payloads, embedded JSON-LD, HTML-inside-JSON envelopes, DB-backed seed
  * scans, frontier dedup and the upload→queue filter chain. All scans +
  * row-local expressions; nothing here shuffles except the dedup/anti-join
  * steps, which shuffle exactly on their keys.
  */
object Sources {

  /** WP-REST-ish item payload schema (reference
    * balipropertiesforsale.py:109-214: paginated JSON API items).
    */
  val wpRestSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("title", StructType(Seq(StructField("rendered", StringType)))),
    StructField("price", LongType),
    StructField("status", StringType)))

  /** JSON-API source: parse an API payload column with an explicit schema
    * — `from_json` is null-on-error like the reference's guarded loads.
    */
  def jsonApi(df: DataFrame, jsonCol: String): DataFrame =
    df.withColumn("item", from_json(col(jsonCol), wpRestSchema))
      .select(col("item.id").as("item_id"),
        col("item.title.rendered").as("title"),
        col("item.price").as("price"),
        col("item.status").as("status"))

  /** JSON-LD embedded source (reference raywhite.py:68-90,
    * dotproperty.py:90-106): jmespath-style paths over an
    * application/ld+json blob via get_json_object.
    */
  def jsonLd(df: DataFrame, scriptCol: String): DataFrame =
    df.select(
      get_json_object(col(scriptCol), "$.offers.price").cast("long").as("price"),
      get_json_object(col(scriptCol), "$.offers.priceCurrency").as("currency"),
      get_json_object(col(scriptCol), "$.name").as("name"))

  /** admin-ajax HTML-in-JSON source (reference tealestate.py:25-59): a
    * JSON envelope whose `content` field is HTML, re-parsed with regexes.
    */
  def htmlInJson(df: DataFrame, envelopeCol: String): DataFrame = {
    val html = get_json_object(col(envelopeCol), "$.content")
    df.select(
      Cleaners.findIdr(html).as("idr"),
      nullif(regexp_extract(html, "class=\"title\">([^<]*)<", 1), lit(""))
        .as("title"))
  }

  /** DB-backed seed scan (reference balihomeimmo.py:23-43): visited-url
    * seed = LIKE-domain + created_at-window filtered scan. Both predicates
    * push to the scan.
    */
  def seedScan(listings: DataFrame, domain: String, since: Column): DataFrame =
    listings
      .filter(col("url").contains(domain) && col("created_at") >= since)
      .select("url")

  /** Frontier de-dup (reference pagination/visited tracking): one url one
    * fetch.
    */
  def frontierDedup(urls: DataFrame): DataFrame = urls.dropDuplicates("url")

  /** Upload→queue filter chain (reference data_routes.py:70-157): keep
    * Available rows' links, drop null/non-http/blacklisted-domain urls,
    * anti-join urls already queued, dedup. Set-based: the N-per-row loops
    * become two filters and one left-anti join.
    */
  def uploadQueueFilter(upload: DataFrame, existingQueue: DataFrame,
                        blacklist: Seq[String]): DataFrame = {
    val urls = upload
      .filter(col("Availability") === "Available")
      .select(col("Property Link").as("url"))
      .filter(col("url").isNotNull && col("url").startsWith("http"))
      .filter(!Cleaners.getDomain(col("url")).isin(blacklist: _*) ||
        Cleaners.getDomain(col("url")).isNull)
    urls
      .join(existingQueue.select("url"), Seq("url"), "left_anti")
      .dropDuplicates("url")
  }
}
