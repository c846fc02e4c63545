package graft

import java.sql.Timestamp
import java.time.LocalDate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden end-to-end (SURVEY §5.3 / FIXTURES.md): raw scraped items →
  * Standardize → Quality → Merge → delist, asserted row-exact against
  * hand-computed expectations.
  */
class GoldenPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val asOf = LocalDate.of(2026, 8, 15)

  private def raw = Seq(
    // existing listing re-crawled with a new price
    ("u1", "KIBR", "Off plan 3 bedroom Villa in Canggu", "IDR 2.500.000.000",
      "Villa for Sale", "Leasehold 25 years",
      "Land size: 450 m2\nleasehold 25 years", Seq.empty[String],
      "https://x.com/img-300x200.jpg"),
    // new Land listing with zoning + are-sized plot, USD price
    ("u2", "KIBR", "Land plot in Ubud", "USD 250,000", "Land for Sale",
      "for sale", "Total area 5 are\nZoning: yellow area", Seq.empty[String],
      "https://x.com/plot.png"),
    // new sold listing with a pile of quality issues
    ("u3", "KIBR", "N/A", "price request", "Villa", "freehold", "",
      Seq("SOLD out"), "https://x.com/a.jpg"))
    .toDF("url", "source", "raw_title", "raw_price", "raw_type",
      "raw_contract", "raw_desc", "labels", "raw_image")

  /** Current table = last month's crawl standardized, with assigned ids. */
  private def currentTable = {
    val rawOld = Seq(
      ("u0", "KIBR", "old title", "IDR 500", "Villa", "freehold",
        "plain desc", Seq.empty[String], "img"),
      ("u1", "KIBR", "old title", "IDR 100", "Villa", "freehold",
        "plain desc", Seq.empty[String], "img"))
      .toDF("url", "source", "raw_title", "raw_price", "raw_type",
        "raw_contract", "raw_desc", "labels", "raw_image")
    Standardize(rawOld, LocalDate.of(2026, 7, 1))
      .withColumn("reid_id", when(col("url") === "u0", "REID_26_07_KIBR_001")
        .otherwise("REID_26_07_KIBR_002"))
  }

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("standardize produces the expected typed columns row-exact") {
    val std = Standardize(raw, asOf)
    val got = std.orderBy("url").select("url", "price", "currency", "title",
      "property_type", "contract_type", "bedrooms", "land_size",
      "leasehold_years", "availability", "is_available", "is_off_plan",
      "location", "land_zoning", "image_url")
      .collect().map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) null else r.get(i)).toList).toList
    assert(got == List(
      List("u1", 2500000000L, "IDR", "Off plan 3 bedroom Villa in Canggu",
        "Villa", "Leasehold", 3.0, 450.0, 25.0, "Available", true, true,
        "Canggu", null, "https://x.com/img.jpg"),
      List("u2", 250000L, "USD", "Land plot in Ubud", "Land", "Freehold",
        null, 500.0, null, "Available", true, false, "Ubud", "Residential",
        "https://x.com/plot.png"),
      List("u3", 0L, "IDR", "N/A", "Villa", "Freehold", null, null, null,
        "Sold", false, false, null, null, "https://x.com/a.jpg")))
  }

  test("quality rules fire exactly as expected per row") {
    val issues = Quality.withIssues(Standardize(raw, asOf))
      .orderBy("url").select("url", "issues")
      .as[(String, Seq[String])].collect().toList
    assert(issues == List(
      ("u1", Seq.empty),
      ("u2", Seq.empty), // Land exempts no_bedrooms; zoning already set
      ("u3", Seq("no_bedrooms", "no_price", "no_title", "no_description",
        "no_location", "not_available"))))
  }

  test("merge upserts, sequences new ids, and delist marks the missing url") {
    val std = Standardize(raw, asOf)
    val merged = Merge.merge(currentTable, std, asOf)
    val got = merged.orderBy("url")
      .select("url", "reid_id", "price", "tab", "is_new", "changed")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getBoolean(4), r.getBoolean(5))).toList
    assert(got == List(
      ("u0", "REID_26_07_KIBR_001", 500L, "DATA", false, false), // untouched
      ("u1", "REID_26_07_KIBR_002", 2500000000L, "DATA", false, true), // price overwrite
      ("u2", "REID_26_07_KIBR_003", 250000L, "ALL LAND", true, false), // new Land
      ("u3", "REID_26_07_KIBR_004", 0L, "DATA", true, false))) // new sold

    val delisted = Merge.delistMissing(currentTable, std, asOf)
      .select("url", "availability", "sold_at")
      .collect().map(r => (r.getString(0), r.getString(1), r.getTimestamp(2))).toList
    assert(delisted == List(("u0", "Delisted", ts("2026-07-01"))))
  }
}
