package graft

import java.time.LocalDate
import graft.functions.{Cleaners, Udfs}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Raw-item standardization (SURVEY §2.7/§3.1): the ItemLoader
  * MapCompose+TakeFirst semantics (reid/items.py:20-87) as per-field
  * ordered coalesce chains over extraction candidates — strategy ORDER is
  * semantic and preserved (SURVEY §7.4.5).
  *
  * Input: one row per scraped detail page with raw string fields
  * (url, source, raw_title, raw_price, raw_type, raw_contract, raw_desc,
  * labels array, raw_image). Output: a listing-shaped frame ready for
  * Quality + Merge.
  */
object Standardize {

  def apply(raw: DataFrame, asOf: LocalDate): DataFrame = {
    val asOfYear = asOf.getYear
    val asOfStr = asOf.toString
    val price = coalesce(
      Cleaners.findIdr(col("raw_price")),
      Cleaners.findUsd(col("raw_price")),
      Udfs.reExtractPrice(col("raw_price")))
    raw.select(
      col("url"),
      col("source"),
      lit(null).cast("string").as("reid_id"),
      Cleaners.removeWhitespace(col("raw_title")).as("title"),
      lit(null).cast("string").as("region"),
      lit(asOfStr).cast("timestamp").as("scraped_at"),
      lit(asOfStr).cast("timestamp").as("created_at"),
      lit(asOfStr).cast("timestamp").as("updated_at"),
      lit("DATA").as("tab"),
      price.as("price"),
      coalesce(Cleaners.identifyCurrency(col("raw_price")), lit("IDR")).as("currency"),
      Cleaners.anySoldDelisted(col("labels")).as("availability"),
      (Cleaners.anySoldDelisted(col("labels")) === "Available").as("is_available"),
      Quality.checkOffPlan(col("raw_title"), col("raw_desc"), col("labels"))
        .as("is_off_plan"),
      Cleaners.dimensionRemover(coalesce(col("raw_image"), lit(""))).as("image_url"),
      col("raw_desc").as("description"),
      coalesce(Cleaners.findLocationInTitle(col("raw_title")),
        Udfs.findLocationInDescription(col("raw_desc"))).as("location"),
      Udfs.leaseholdYearsFinders(asOfYear)(col("raw_desc"))
        .cast("double").as("leasehold_years"),
      Cleaners.getContractType(col("raw_contract")).as("contract_type"),
      Cleaners.standardizePropertyType(col("raw_type")).as("property_type"),
      coalesce(Cleaners.findBedrooms(col("raw_title")),
        Udfs.findBedroomsInDescription(col("raw_desc"))).cast("double").as("bedrooms"),
      lit(null).cast("double").as("bathrooms"),
      Udfs.findBuildSize(col("raw_desc")).as("build_size"),
      Udfs.findLandSize(col("raw_desc")).as("land_size"),
      lit(null).cast("string").as("land_zoning"),
      lit(null).cast("string").as("property_id"),
      lit(null).cast("string").as("listed_date"),
      lit(null).cast("timestamp").as("sold_at"))
      .withColumn("land_zoning",
        Quality.defineLandZoning(col("property_type"), col("description")))
  }

}
