package graft

import java.time.LocalDate

import graft.functions.{Cleaners, Udfs}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-source standardization profiles: the reference's ItemLoader configs
  * are per-source *candidate orderings* over selector outputs plus ordered
  * post-load fixups (reference reid/items.py:20-87 field processors;
  * reid/spiders/ubudproperty.py:96-171; reid/spiders/dotproperty.py:85-175;
  * reid/spiders/balivillasales.py:40-157 + reid/customs/balivillasales
  * .py:1-22). [[Standardize]] is the generic chain; this wires the three
  * representative sources' actual candidate order and fixups.
  *
  * Input contract: one row per scraped detail page whose columns are the
  * *selector outputs* the spider extracts (CSS/JSON selection itself is
  * acquisition, out of scope per SURVEY §1) — `url, source, raw_title,
  * alt_title, raw_location, raw_contract, raw_type, raw_price, json_price,
  * json_currency, raw_beds, raw_baths, raw_land, raw_build, raw_image,
  * raw_desc, raw_pid, lease_text, table_leasing` (all strings).
  *
  * Execution shape: every field and fixup is a row-local Column expression
  * (TakeFirst = coalesce; MapCompose = expression composition; post-load
  * mutation = sequential withColumn). Dispatch filters per source and
  * unions: with the raw table partitioned by source — the natural layout
  * for a crawler staging area — each branch prunes to its own partition,
  * so at 100 TB a profile reads only its slice and the whole operator runs
  * shuffle-free inside one codegen stage.
  *
  * Modeled deviations from the reference (all documented, all spec-pinned):
  * the reference *raises* on a few null fields (e.g. `"Leasehold" in None`)
  * and routes the whole item to the Error sink; the engine keeps the row
  * and skips that fixup. `delisted_item` emission is modeled as
  * `availability = "Delisted"` on the same row. Ubud's publish-date max
  * (html source list) is acquisition-side and not modeled.
  */
object SourceProfiles {

  /** Canonical standardized output schema (listing-shaped). */
  val targets: Seq[String] = Seq(
    "url", "source", "title", "property_id", "location", "contract_type",
    "property_type", "leasehold_years", "bedrooms", "bathrooms",
    "land_size", "build_size", "price", "currency", "availability",
    "image_url", "listed_date", "description")

  private def nullIfEmpty(c: Column): Column = nullif(c, lit(""))

  /** A profile: ordered (target, expression) field candidates evaluated
    * over the raw selector columns, then ordered row-local fixups applied
    * sequentially (each sees the previous ones' results, like the
    * reference's item-dict mutation).
    */
  final case class SourceProfile(
      source: String,
      fields: LocalDate => Seq[(String, Column)],
      fixups: LocalDate => Seq[(String, Column)]) {

    def apply(raw: DataFrame, asOf: LocalDate): DataFrame = {
      val withFields = fields(asOf).foldLeft(raw) {
        case (d, (name, expr)) => d.withColumn(name, expr)
      }
      val fixed = fixups(asOf).foldLeft(withFields) {
        case (d, (name, expr)) => d.withColumn(name, expr)
      }
      fixed.select(targets.map(col): _*)
    }
  }

  /** reference reid/spiders/ubudproperty.py:96-171 +
    * reid/customs/ubudproperty.py. Loader: code from the alt title,
    * constant location, table-cell contract/beds/baths/sizes, first word
    * of the type cell title-cased into the standardize ladder, IDR-else-USD
    * price, h5 lease-years text.
    */
  val ubudproperty: SourceProfile = SourceProfile(
    "ubudproperty",
    fields = asOf => {
      val idr = Cleaners.findIdr(col("raw_price"))
      val usd = Cleaners.findUsd(col("raw_price"))
      Seq(
        "property_id" -> Cleaners.findCode(col("alt_title")),
        "title" -> nullIfEmpty(trim(col("raw_title"))),
        "location" -> lit("Ubud"),
        "contract_type" -> nullIfEmpty(trim(col("raw_contract"))),
        "property_type" -> Cleaners.standardizePropertyType(
          initcap(element_at(split(trim(col("raw_type")), "\\s+", -1), 1))),
        "leasehold_years" ->
          Udfs.ubudFindLeaseholdYears(asOf.getYear)(col("lease_text"))
            .cast("double"),
        "bedrooms" -> Udfs.toNumber(col("raw_beds")).cast("double"),
        "bathrooms" -> Udfs.toNumber(col("raw_baths")).cast("double"),
        "land_size" -> Udfs.findLandSize(col("raw_land")).cast("double"),
        "build_size" -> Udfs.findBuildSize(col("raw_build")).cast("double"),
        "price" -> when(idr.isNotNull, idr)
          .when(usd.isNotNull, usd).cast("double"),
        "currency" -> when(idr.isNotNull, "IDR")
          .when(usd.isNotNull, "USD"),
        "availability" -> lit("Available"),
        "image_url" -> nullIfEmpty(trim(col("raw_image"))),
        "listed_date" -> lit(null).cast("string"),
        "description" -> nullIfEmpty(trim(col("raw_desc"))))
    },
    fixups = asOf => Seq(
      // stash the pre-fallback title: the reference's description fixup
      // replaces the OLD title variable even after the alt_title fallback
      "_title0" -> col("title"),
      // ubudproperty.py:141-143 — missing or "." title → alt title
      "title" -> when(col("title").isNull || col("title") === ".",
        nullIfEmpty(trim(col("alt_title")))).otherwise(col("title")),
      // ubudproperty.py:144-156 — type from title keyword, else beds>0.
      // NB the reference's local `title` var predates the alt_title
      // fallback, so the keyword search runs on the ORIGINAL title
      "property_type" -> {
        val kw = nullIfEmpty(
          regexp_extract(col("_title0"), "(?i)(land|hotel|villa)", 1))
        when(col("_title0").isNotNull &&
          !coalesce(col("property_type"), lit("")).isin("Villa", "Land", "House"),
          when(kw.isNotNull, Cleaners.definePropertyType(initcap(kw)))
            .otherwise(when(coalesce(col("bedrooms"), lit(0d)) > 0, "Villa")
              .otherwise("Land")))
          .otherwise(col("property_type"))
      },
      // ubudproperty.py:157-160 — drop the title text from the description
      "description" -> when(
        col("_title0").isNotNull && col("title").isNotNull &&
          contains(col("description"), col("title")),
        nullIfEmpty(replace(col("description"), col("_title0"))))
        .otherwise(col("description")),
      // ubudproperty.py:161-168 — lease years from the LEASING table cell
      "leasehold_years" -> when(
        coalesce(col("contract_type"), lit("")).contains("Leasehold") &&
          (col("leasehold_years").isNull || col("leasehold_years") === 0) &&
          nullIfEmpty(col("table_leasing")).isNotNull,
        Udfs.ubudFindLeaseholdYears(asOf.getYear)(col("table_leasing"))
          .cast("double"))
        .otherwise(col("leasehold_years")),
      // ubudproperty.py:169-171 — freehold never carries lease years
      "leasehold_years" -> when(
        coalesce(col("contract_type"), lit("")).contains("Freehold"),
        lit(null).cast("double")).otherwise(col("leasehold_years"))))

  /** reference reid/spiders/dotproperty.py:85-175. Loader: ld+json price
    * and currency, after-colon property id, breadcrumb type, key-featured
    * numerics, lease-years cascade over the description; contract derived
    * lease-years → url marker → get_contract_type(title).
    */
  val dotproperty: SourceProfile = SourceProfile(
    "dotproperty",
    fields = asOf => Seq(
      "title" -> nullIfEmpty(trim(col("raw_title"))),
      "location" -> nullIfEmpty(trim(col("raw_location"))),
      "property_id" -> Cleaners.afterColon(trim(col("raw_pid"))),
      "property_type" ->
        Cleaners.standardizePropertyType(trim(col("raw_type"))),
      "bedrooms" -> Udfs.toNumber(col("raw_beds")).cast("double"),
      "bathrooms" -> Udfs.toNumber(col("raw_baths")).cast("double"),
      "land_size" -> Udfs.toNumber(col("raw_land")).cast("double"),
      "build_size" -> Udfs.toNumber(col("raw_build")).cast("double"),
      "price" -> Udfs.toNumber(col("json_price")).cast("double"),
      "currency" -> nullIfEmpty(upper(trim(col("json_currency")))),
      "availability" -> lit("Available"),
      "image_url" -> nullIfEmpty(trim(col("raw_image"))),
      "listed_date" -> lit(null).cast("string"),
      "description" -> nullIfEmpty(trim(col("raw_desc"))),
      "leasehold_years" ->
        Udfs.leaseholdYearsFinders(asOf.getYear)(col("raw_desc"))
          .cast("double")),
    fixups = _ => Seq(
      // dotproperty.py:117-130 — lease years → Leasehold; /for-sale/ url →
      // Freehold; else get_contract_type over the title (the first
      // candidate the reference's MapCompose+TakeFirst can produce)
      "contract_type" -> when(
        col("leasehold_years").isNotNull && col("leasehold_years") =!= 0,
        "Leasehold")
        .when(col("url").contains("for-sale"), "Freehold")
        .otherwise(Cleaners.getContractType(trim(col("raw_title")))),
      // dotproperty.py:142-155 — two ordered bedroom regexes over the desc
      "bedrooms" -> when(
        col("bedrooms").isNull || col("bedrooms") === 0,
        coalesce(
          nullIfEmpty(regexp_extract(col("description"),
            "(?i)(\\d)\\s*bedrooms", 1)).cast("double"),
          nullIfEmpty(regexp_extract(col("description"),
            "(?i)bedrooms\\s*(\\d)", 1)).cast("double")))
        .otherwise(col("bedrooms")),
      // dotproperty.py:156-175 — desc backfill for missing sizes
      "land_size" -> when(col("land_size").isNull || col("land_size") === 0,
        Udfs.findLandSize(col("description")).cast("double"))
        .otherwise(col("land_size")),
      "build_size" -> when(col("build_size").isNull || col("build_size") === 0,
        Udfs.findBuildSize(col("description")).cast("double"))
        .otherwise(col("build_size"))))

  /** reference reid/spiders/balivillasales.py:40-157 ("Villas of Bali") +
    * reid/customs/balivillasales.py:1-22. Loader: compound price text
    * drives price/currency/availability; m2-and-comma cleanup on sizes;
    * type from the title; upload date from the image url.
    */
  val balivillasales: SourceProfile = SourceProfile(
    "balivillasales",
    fields = asOf => {
      val sizeClean = (c: Column) =>
        Udfs.toNumber(Cleaners.getFirst(
          regexp_replace(regexp_replace(c, "m2", ""), ",", "."), "-"))
          .cast("double")
      Seq(
        "title" -> nullIfEmpty(trim(col("raw_title"))),
        "property_id" -> nullIfEmpty(trim(col("raw_pid"))),
        "location" -> nullIfEmpty(trim(col("raw_location"))),
        "contract_type" -> nullIfEmpty(trim(col("raw_contract"))),
        "property_type" ->
          Cleaners.standardizePropertyType(trim(col("raw_title"))),
        // balivillasales.py:50-56 — literal case-sensitive IDR/USD probes
        "price" -> when(col("raw_price").contains("IDR"),
          Udfs.toNumber(col("raw_price")))
          .when(col("raw_price").contains("USD"),
            Udfs.toNumber(col("raw_price"))).cast("double"),
        "currency" -> when(col("raw_price").contains("IDR"), "IDR")
          .when(col("raw_price").contains("USD"), "USD"),
        "availability" -> when(col("raw_price").contains("Sold"), "Sold")
          .otherwise("Available"),
        "image_url" -> nullIfEmpty(trim(col("raw_image"))),
        "listed_date" -> Udfs.getUploadedDate(col("raw_image")).cast("string"),
        "land_size" -> sizeClean(col("raw_land")),
        "build_size" -> sizeClean(col("raw_build")),
        "bedrooms" -> Udfs.toNumber(col("raw_beds")).cast("double"),
        "bathrooms" -> Udfs.toNumber(col("raw_baths")).cast("double"),
        "leasehold_years" -> lit(null).cast("double"),
        "description" -> nullIfEmpty(trim(col("raw_desc"))))
    },
    fixups = asOf => Seq(
      // balivillasales.py:120-123 — empty title / missing contract →
      // delisted_item (modeled as availability on the same row)
      "availability" -> when(
        col("title").isNull || col("contract_type").isNull, "Delisted")
        .otherwise(col("availability")),
      // balivillasales.py:125-132 — desc then title location fallbacks
      "location" -> coalesce(col("location"),
        Udfs.findLocationInDescription(col("description")),
        nullIfEmpty(regexp_extract(col("title"), "in ([A-Za-z ]+)", 1))),
      // balivillasales.py:134-138 — desc backfill for missing sizes
      "land_size" -> when(col("land_size").isNull || col("land_size") === 0,
        Udfs.findLandSize(col("description")).cast("double"))
        .otherwise(col("land_size")),
      "build_size" -> when(col("build_size").isNull || col("build_size") === 0,
        Udfs.findBuildSize(col("description")).cast("double"))
        .otherwise(col("build_size")),
      // balivillasales.py:140-147 — equal sizes (None==None included, so
      // null-safe <=>) mean a land listing: drop build, force type
      "property_type" -> when(col("land_size") <=> col("build_size"), "Land")
        .otherwise(col("property_type")),
      "build_size" -> when(col("land_size") <=> col("build_size"),
        lit(null).cast("double")).otherwise(col("build_size")),
      // balivillasales.py:149-151 — lowercase-literal leasehold probe
      "leasehold_years" -> when(
        (col("leasehold_years").isNull || col("leasehold_years") === 0) &&
          coalesce(col("contract_type"), lit("")).contains("leasehold"),
        Udfs.findLeaseYears(asOf.getYear)(col("description")).cast("double"))
        .otherwise(col("leasehold_years")),
      // balivillasales.py:153-155 — bedrooms fallback from the desc
      "bedrooms" -> when(col("bedrooms").isNull || col("bedrooms") === 0,
        Cleaners.findBedrooms(col("description")).cast("double"))
        .otherwise(col("bedrooms"))))

  val profiles: Seq[SourceProfile] =
    Seq(ubudproperty, dotproperty, balivillasales)

  /** Standardize a raw selector-output frame through every registered
    * profile; rows whose source has no profile are dropped (the reference
    * has no generic spider either).
    */
  def standardize(raw: DataFrame, asOf: LocalDate): DataFrame =
    profiles.map(p => p(raw.filter(col("source") === p.source), asOf))
      .reduce(_ unionByName _)

  /** Correctness query: raw selector rows synthesized deterministically
    * from `part` for all three wired profiles, standardized, and compared
    * against a DuckDB oracle that mirrors each profile's candidate order
    * and fixups. Every branch of every fixup is exercised by some modulus
    * class.
    */
  def q55SourceProfiles(s: SparkSession, d: String): DataFrame = {
    val asOf = LocalDate.of(2026, 1, 1)
    val k = col("p_partkey").cast("string")
    val m = col("p_partkey") % 3
    val sz = col("p_size")
    val raw = Tables.part(s, d).select(
      when(m === 0, concat(lit("https://ubud.example/"), k))
        .when(m === 1,
          when(sz % 3 === 1, concat(lit("https://dot.example/for-sale/"), k))
            .otherwise(concat(lit("https://dot.example/item/"), k)))
        .otherwise(concat(lit("https://bali.example/"), k)).as("url"),
      when(m === 0, "ubudproperty").when(m === 1, "dotproperty")
        .otherwise("balivillasales").as("source"),
      when(m === 0, when(sz % 5 === 0, lit("."))
        .otherwise(concat(lit("Elegant "), col("p_type"), lit(" retreat"))))
        .when(m === 1, concat(lit("Charming "), col("p_brand")))
        .otherwise(when(sz % 4 === 0, lit(null))
          .otherwise(lit("Tropical villa in Ubud"))).as("raw_title"),
      when(m === 0, concat(lit("UB"), k, lit(" (ref)"))).as("alt_title"),
      when(m === 1, concat(lit("Area"), sz.cast("string"))).as("raw_location"),
      when(m === 0, when(sz % 2 === 0, "Leasehold").otherwise("Freehold"))
        .when(m === 2, when(sz % 5 === 0, "leasehold option")
          .otherwise("Freehold title")).as("raw_contract"),
      when(m === 0, concat(col("p_type"), lit(" unit")))
        .when(m === 1, when(sz % 2 === 0, "Villa in paradise"))
        .as("raw_type"),
      when(m === 0, when(sz % 9 === 0,
        concat(lit("USD "), (col("p_partkey") * 2).cast("string")))
        .otherwise(concat(lit("IDR "), (col("p_partkey") * 1000).cast("string"))))
        .when(m === 2, {
          val base = when(sz % 2 === 0,
            concat(lit("IDR "), (col("p_partkey") * 500).cast("string")))
            .otherwise(lit("USD 350000"))
          when(sz % 7 === 0, concat(base, lit(" Sold"))).otherwise(base)
        }).as("raw_price"),
      when(m === 1, (col("p_partkey") * 1000).cast("string")).as("json_price"),
      when(m === 1, when(sz % 2 === 0, "idr").otherwise("usd"))
        .as("json_currency"),
      when(m === 0, when(sz % 4 === 0, lit(null))
        .otherwise((sz % 6).cast("string")))
        .when(m === 2, (sz % 5).cast("string")).as("raw_beds"),
      lit(null).cast("string").as("raw_baths"),
      when(m === 2, concat((sz + 100).cast("string"), lit(" m2")))
        .as("raw_land"),
      when(m === 2, when(sz % 6 === 0,
        concat((sz + 100).cast("string"), lit(" m2")))
        .otherwise(concat((sz + 50).cast("string"), lit(" m2"))))
        .as("raw_build"),
      lit(null).cast("string").as("raw_image"),
      when(m === 0, concat(lit("Elegant "), col("p_type"), lit(" retreat with pool")))
        .when(m === 1, when(sz % 3 === 0, lit("leasehold 30 years available"))
          .when(sz % 3 === 1, lit("has 3 bedrooms total. Land size: 450 m2"))
          .otherwise(lit("plain description")))
        .otherwise(when(sz % 5 === 0, lit("leasehold 30 years"))
          .otherwise(lit("desc text"))).as("raw_desc"),
      when(m === 1, concat(lit("Ref: DP-"), k))
        .when(m === 2, concat(lit("VOB-"), k)).as("raw_pid"),
      lit(null).cast("string").as("lease_text"),
      when(m === 0, when(sz % 3 === 0,
        concat((lit(20) + sz % 30).cast("string"), lit(" year"))))
        .as("table_leasing"))
    standardize(raw, asOf).select("url", "source", "title", "property_id",
      "location", "contract_type", "property_type", "leasehold_years",
      "bedrooms", "land_size", "build_size", "price", "currency",
      "availability", "description")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_source_profiles" -> (q55SourceProfiles _))

  /** The oracle mirrors what each profile must produce for the synthesized
    * inputs: the string synthesis collapses, so every output field is a
    * CASE over the same modulus classes the Spark side synthesizes from.
    */
  val oracle: Map[String, String] = Map(
    "q55_source_profiles" ->
      """SELECT
        |  CASE WHEN p_partkey % 3 = 0 THEN 'https://ubud.example/' || p_partkey
        |       WHEN p_partkey % 3 = 1 THEN
        |         CASE WHEN p_size % 3 = 1 THEN 'https://dot.example/for-sale/' || p_partkey
        |              ELSE 'https://dot.example/item/' || p_partkey END
        |       ELSE 'https://bali.example/' || p_partkey END AS url,
        |  CASE WHEN p_partkey % 3 = 0 THEN 'ubudproperty'
        |       WHEN p_partkey % 3 = 1 THEN 'dotproperty'
        |       ELSE 'balivillasales' END AS source,
        |  CASE WHEN p_partkey % 3 = 0 THEN
        |         CASE WHEN p_size % 5 = 0 THEN 'UB' || p_partkey || ' (ref)'
        |              ELSE 'Elegant ' || p_type || ' retreat' END
        |       WHEN p_partkey % 3 = 1 THEN 'Charming ' || p_brand
        |       ELSE CASE WHEN p_size % 4 = 0 THEN NULL
        |            ELSE 'Tropical villa in Ubud' END END AS title,
        |  CASE WHEN p_partkey % 3 = 0 THEN 'UB' || p_partkey
        |       WHEN p_partkey % 3 = 1 THEN 'DP-' || p_partkey
        |       ELSE 'VOB-' || p_partkey END AS property_id,
        |  CASE WHEN p_partkey % 3 = 0 THEN 'Ubud'
        |       WHEN p_partkey % 3 = 1 THEN 'Area' || p_size
        |       ELSE CASE WHEN p_size % 4 <> 0 THEN 'Ubud' END END AS location,
        |  CASE WHEN p_partkey % 3 = 0 THEN
        |         CASE WHEN p_size % 2 = 0 THEN 'Leasehold' ELSE 'Freehold' END
        |       WHEN p_partkey % 3 = 1 THEN
        |         CASE WHEN p_size % 3 = 0 THEN 'Leasehold' ELSE 'Freehold' END
        |       ELSE CASE WHEN p_size % 5 = 0 THEN 'leasehold option'
        |            ELSE 'Freehold title' END END AS contract_type,
        |  CASE WHEN p_partkey % 3 = 0 THEN
        |         CASE WHEN p_size % 4 <> 0 AND p_size % 6 <> 0 THEN 'Villa'
        |              ELSE 'Land' END
        |       WHEN p_partkey % 3 = 1 THEN
        |         CASE WHEN p_size % 2 = 0 THEN 'Villa' END
        |       ELSE CASE WHEN p_size % 6 = 0 THEN 'Land'
        |            WHEN p_size % 4 = 0 THEN NULL
        |            ELSE 'Villa' END END AS property_type,
        |  CASE WHEN p_partkey % 3 = 0 THEN
        |         CASE WHEN p_size % 2 = 0 AND p_size % 3 = 0
        |              THEN CAST(20 + p_size % 30 AS DOUBLE) END
        |       WHEN p_partkey % 3 = 1 THEN
        |         CASE WHEN p_size % 3 = 0 THEN 30.0 END
        |       ELSE CASE WHEN p_size % 5 = 0 THEN 30.0 END END AS leasehold_years,
        |  CASE WHEN p_partkey % 3 = 0 THEN
        |         CASE WHEN p_size % 4 = 0 THEN NULL
        |              ELSE CAST(p_size % 6 AS DOUBLE) END
        |       WHEN p_partkey % 3 = 1 THEN
        |         CASE WHEN p_size % 3 = 1 THEN 3.0 END
        |       ELSE CASE WHEN p_size % 5 = 0 THEN NULL
        |            ELSE CAST(p_size % 5 AS DOUBLE) END END AS bedrooms,
        |  CASE WHEN p_partkey % 3 = 1 THEN
        |         CASE WHEN p_size % 3 = 1 THEN 450.0 END
        |       WHEN p_partkey % 3 = 2 THEN CAST(p_size + 100 AS DOUBLE)
        |       END AS land_size,
        |  CASE WHEN p_partkey % 3 = 2 AND p_size % 6 <> 0
        |       THEN CAST(p_size + 50 AS DOUBLE) END AS build_size,
        |  CASE WHEN p_partkey % 3 = 0 THEN
        |         CASE WHEN p_size % 9 = 0 THEN CAST(p_partkey * 2 AS DOUBLE)
        |              ELSE CAST(p_partkey * 1000 AS DOUBLE) END
        |       WHEN p_partkey % 3 = 1 THEN CAST(p_partkey * 1000 AS DOUBLE)
        |       ELSE CASE WHEN p_size % 2 = 0 THEN CAST(p_partkey * 500 AS DOUBLE)
        |            ELSE 350000.0 END END AS price,
        |  CASE WHEN p_partkey % 3 = 0 THEN
        |         CASE WHEN p_size % 9 = 0 THEN 'USD' ELSE 'IDR' END
        |       WHEN p_partkey % 3 = 1 THEN
        |         CASE WHEN p_size % 2 = 0 THEN 'IDR' ELSE 'USD' END
        |       ELSE CASE WHEN p_size % 2 = 0 THEN 'IDR' ELSE 'USD' END
        |       END AS currency,
        |  CASE WHEN p_partkey % 3 = 2 THEN
        |         CASE WHEN p_size % 4 = 0 THEN 'Delisted'
        |              WHEN p_size % 7 = 0 THEN 'Sold'
        |              ELSE 'Available' END
        |       ELSE 'Available' END AS availability,
        |  CASE WHEN p_partkey % 3 = 0 THEN
        |         CASE WHEN p_size % 5 = 0
        |              THEN 'Elegant ' || p_type || ' retreat with pool'
        |              ELSE ' with pool' END
        |       WHEN p_partkey % 3 = 1 THEN
        |         CASE WHEN p_size % 3 = 0 THEN 'leasehold 30 years available'
        |              WHEN p_size % 3 = 1 THEN 'has 3 bedrooms total. Land size: 450 m2'
        |              ELSE 'plain description' END
        |       ELSE CASE WHEN p_size % 5 = 0 THEN 'leasehold 30 years'
        |            ELSE 'desc text' END END AS description
        |FROM part""".stripMargin)
}
