package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The wide report export (SURVEY §2.8): reference to_dict
  * (models/listing.py:175-241) as a single select — currency-split price
  * columns, Delisted→Sold with site_status, epoch-millis timestamps,
  * off-plan Yes/No. Spreadsheet-facing display names are kept in
  * [[displayNames]]; the DataFrame itself uses snake_case so every sink
  * (parquet included) accepts the schema.
  */
object Export {

  /** snake_case column → reference spreadsheet header. */
  val displayNames: Map[String, String] = Map(
    "source_a" -> "Source A", "property_id" -> "ID", "reid_id" -> "REID ID",
    "region" -> "Region", "location" -> "Location",
    "contract_type" -> "Contract Type", "property_type" -> "Property Type",
    "years" -> "Years", "bedrooms" -> "Bedrooms", "bathrooms" -> "Bathrooms",
    "land_size_sqm" -> "Land Size (SQM)", "build_size_sqm" -> "Build Size (SQM)",
    "price_idr" -> "Price", "price_usd" -> "Price ($)",
    "availability" -> "Availability", "site_status" -> "Site Status",
    "sold_date_ms" -> "Sold Date", "scrape_date_ms" -> "Scrape Date",
    "list_date" -> "List Date", "property_link" -> "Property Link",
    "image" -> "Image", "title" -> "Title", "description" -> "Description",
    "off_plan" -> "Off-plan")

  /** reference models/listing.py:175-241. */
  def toDict(df: DataFrame): DataFrame =
    df.select(
      col("source").as("source_a"),
      col("property_id"),
      col("reid_id"),
      col("region"),
      col("location"),
      col("contract_type"),
      col("property_type"),
      col("leasehold_years").as("years"),
      col("bedrooms"),
      col("bathrooms"),
      col("land_size").as("land_size_sqm"),
      col("build_size").as("build_size_sqm"),
      when(col("currency") === "IDR", col("price")).as("price_idr"),
      when(col("currency") === "USD", col("price")).as("price_usd"),
      when(col("availability") === "Delisted", "Sold")
        .otherwise(col("availability")).as("availability"),
      when(col("availability") === "Delisted", "Delisted").as("site_status"),
      unix_millis(col("sold_at")).as("sold_date_ms"),
      unix_millis(col("scraped_at")).as("scrape_date_ms"),
      col("listed_date").as("list_date"),
      col("url").as("property_link"),
      col("image_url").as("image"),
      col("title"),
      col("description"),
      when(col("is_off_plan"), "Yes").otherwise("No").as("off_plan"))
}
