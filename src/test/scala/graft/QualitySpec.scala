package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the 12 issue rules (models/property.py:70-138),
  * off-plan detection and land-zoning classification.
  */
class QualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private case class P(
    id: String, bedrooms: Option[Double], property_type: Option[String],
    price: Option[Long], title: Option[String], description: Option[String],
    location: Option[String], build_size: Option[Double],
    land_size: Option[Double], contract_type: Option[String],
    leasehold_years: Option[Double], availability: Option[String],
    land_zoning: Option[String])

  private def base = P("x", Some(2.0), Some("Villa"), Some(100L), Some("t"),
    Some("d"), Some("loc"), None, None, Some("Freehold"), None,
    Some("Available"), None)

  private def issuesOf(p: P): Seq[String] = {
    val df = spark.createDataFrame(Seq(p))
    Quality.withIssues(df).select("issues").as[Seq[String]].head
  }

  test("clean listing has no issues") { assert(issuesOf(base) == Seq.empty) }

  test("each rule fires on its trigger") {
    assert(issuesOf(base.copy(bedrooms = Some(13))) == Seq("has_more_than_13_bedrooms"))
    assert(issuesOf(base.copy(bedrooms = None)) == Seq("no_bedrooms"))
    assert(issuesOf(base.copy(bedrooms = Some(0))) == Seq("no_bedrooms"))
    assert(issuesOf(base.copy(price = Some(0))) == Seq("no_price"))
    assert(issuesOf(base.copy(title = Some("N/A"))) == Seq("no_title"))
    assert(issuesOf(base.copy(title = None)) == Seq("no_title"))
    assert(issuesOf(base.copy(description = Some(""))) == Seq("no_description"))
    assert(issuesOf(base.copy(location = None)) == Seq("no_location"))
    assert(issuesOf(base.copy(build_size = Some(300), land_size = Some(200)))
      == Seq("build_size_greater_than_land_size"))
    assert(issuesOf(base.copy(contract_type = Some("Leasehold")))
      == Seq("no_leasehold_years"))
    assert(issuesOf(base.copy(availability = Some("Sold"))) == Seq("not_available"))
    assert(issuesOf(base.copy(property_type = Some("Castle")))
      == Seq("unknown_property_type"))
    assert(issuesOf(base.copy(contract_type = Some("Timeshare")))
      == Seq("unknown_contract_type"))
  }

  test("Land-specific rules") {
    // Land: no_bedrooms exempted; with bedrooms → land_with_bedrooms; no zoning
    assert(issuesOf(base.copy(property_type = Some("Land"), bedrooms = None))
      == Seq("no_land_zoning"))
    assert(issuesOf(base.copy(property_type = Some("Land"), bedrooms = Some(2),
      land_zoning = Some("Residential"))) == Seq("land_with_bedrooms"))
  }

  test("leasehold with years is fine") {
    assert(issuesOf(base.copy(contract_type = Some("Leasehold"),
      leasehold_years = Some(25))) == Seq.empty)
  }

  test("checkOffPlan variants") {
    val df = Seq(
      ("OFF-PLAN villa", "", Seq.empty[String]),
      ("nice", "under construction now", Seq.empty[String]),
      ("off the plan project", "", Seq.empty[String]), // normalization regex
      ("plain", "plain", Seq("Offplan unit")),
      ("plain", "plain", Seq("off the plan")), // labels NOT normalized (reference)
      ("plain", "plain", Seq.empty[String])).toDF("title", "description", "labels")
    val got = df.select(Quality.checkOffPlan(col("title"), col("description"),
      col("labels"))).as[Boolean].collect().toSeq
    assert(got == Seq(true, true, true, true, false, false))
  }

  test("defineLandZoning: color wins over category, Land only") {
    val df = Seq(
      ("Land", "great plot\nzoning: yellow area"),
      ("Land", "line\nzoning is tourism zone"),
      ("Land", "zoning: dark green belt"), // "green" matches first (reference order)
      ("Land", "intro line\nZoning residential area"),
      ("Villa", "zoning: yellow"),
      ("Land", "nothing relevant")).toDF("property_type", "description")
    val got = df.select(Quality.defineLandZoning(col("property_type"),
      col("description"))).collect().map(r => Option(r.getString(0))).toSeq
    assert(got == Seq(Some("Residential"), Some("Tourism"), Some("Agricultural"),
      Some("Residential"), None, None))
  }

  test("markTags: bulk PATCH assigns both flags, single-row PUT only one") {
    // tag starts ignored; marking it solved via the two routes differs:
    // bulk clears is_ignored, single-row PUT leaves it set
    val tags = Seq(("p1", "no_price", false, true))
      .toDF("property_id", "name", "is_solved", "is_ignored")
    val ids = Seq("p1").toDF("property_id")
    def row(df: org.apache.spark.sql.DataFrame) =
      df.select("is_solved", "is_ignored").as[(Boolean, Boolean)].head()
    assert(row(Quality.markTags(tags, ids, "no_price", "solved")) == ((true, false)))
    assert(row(Quality.markTags(tags, ids, "no_price", "solved",
      assignBoth = false)) == ((true, true)))
    // untouched rows keep state under both modes
    val other = Seq("p2").toDF("property_id")
    assert(row(Quality.markTags(tags, other, "no_price", "solved")) == ((false, true)))
  }

  test("syncTags solves stale and flags new") {
    val existing = Seq(("p1", "no_price", false), ("p1", "no_title", false))
      .toDF("property_id", "name", "is_solved")
    val fresh = Seq(("p1", "no_title"), ("p1", "no_location"))
      .toDF("property_id", "name")
    val out = Quality.syncTags(existing, fresh)
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2), r.getBoolean(3)))
      .toSet
    assert(out == Set(
      ("p1", "no_price", true, false),   // stale → solved
      ("p1", "no_title", false, false),  // still present
      ("p1", "no_location", false, true))) // new
  }
}
