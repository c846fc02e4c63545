package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Serving analytics on hand fixtures: report totals arithmetic, monthly
  * reid buckets incl. non-matching ids, queue stats keys.
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("reportTotals success-rate arithmetic") {
    val df = Seq((90L, 90L, 10L, 30L), (10L, 10L, 0L, 20L))
      .toDF("success_count", "total_listings", "error_count", "duration")
    val r = Analytics.reportTotals(df).collect().head
    assert(r.getAs[Long]("sum_success") == 100L)
    assert(r.getAs[Long]("sum_errors") == 10L)
    assert(r.getAs[Long]("sum_duration") == 50L)
    // 100 * 100 / (100 + 10)
    assert(math.abs(r.getAs[Double]("success_rate") - 10000.0 / 110) < 1e-12)
  }

  test("monthlyListingCounts buckets by reid month and drops non-matching") {
    val df = Seq("REID_24_10_KIBR_012", "REID_24_10_BOFS_001",
      "REID_25_01_TEST_003", "garbage").toDF("reid_id")
    val got = Analytics.monthlyListingCounts(df)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == Seq("2024-10-01" -> 2L, "2025-01-01" -> 1L))
  }

  test("queueStats exposes the fixed status keys") {
    val df = Seq("Available", "Available", "Error", "Sold").toDF("status")
    val r = Analytics.queueStats(df).collect().head
    assert(r.getAs[Long]("total") == 4L)
    assert(r.getAs[Long]("available") == 2L)
    assert(r.getAs[Long]("errors") == 1L)
    assert(r.getAs[Long]("delisted") == 0L)
    assert(r.getAs[Long]("sold") == 1L)
  }

  test("domains extracts, drops null, sorts") {
    val df = Seq("https://b.com/x", "https://a.com/y", "nota url",
      "https://a.com/z").toDF("url")
    val got = Analytics.domains(df).as[String].collect().toSeq
    assert(got == Seq("a.com", "b.com"))
  }
}
