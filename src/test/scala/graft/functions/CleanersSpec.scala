package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-checks the Column-expression library against the Parse kernel:
  * every Cleaners function must produce the kernel's output on the
  * reference-derived fixture strings (one engine, two encodings — they may
  * not drift).
  */
class CleanersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(inputs: Seq[String], c: Column => Column): Seq[Any] =
    inputs.toDF("s").select(c(col("s"))).collect().toSeq.map(r =>
      if (r.isNullAt(0)) null else r.get(0))

  private val priceTexts = Seq("Rp. 2.500.000.000 nego", "IDR 5 juta/m2",
    "2,5 M", "750 juta per tahun", "USD 250,000 - negotiable",
    "Rp 1.5m bersih", "500/m2 rupiah", "price request", "USD 1,250,000",
    "usd 350.000", "IDR 2.500.000.000", "idr 5,000,000", "Harga IDR 750.000")

  test("cleanPriceText column == kernel") {
    assert(run(priceTexts, Cleaners.cleanPriceText(_)) ==
      priceTexts.map(Parse.cleanPriceText))
  }

  test("findIdr / findUsd columns == kernel") {
    assert(run(priceTexts, Cleaners.findIdr(_)) ==
      priceTexts.map(s => Parse.findIdr(s).map(Long.box).orNull))
    assert(run(priceTexts, Cleaners.findUsd(_)) ==
      priceTexts.map(s => Parse.findUsd(s).map(Long.box).orNull))
  }

  test("areToSqm column == kernel") {
    val inputs = Seq("5.5 are", "10 Are land", "2,25 are", "450 sqm", "7 ares")
    assert(run(inputs, Cleaners.areToSqm(_)) ==
      inputs.map(s => Parse.areToSqm(s).map(Long.box).orNull))
  }

  test("currency columns == kernel") {
    val inputs = Seq("price IDR 500", "USD 1000", "Rp 2.500", "IDR2500000",
      "USD350000", "Rp5000", "euros only")
    assert(run(inputs, Cleaners.extractCurrency(_)) ==
      inputs.map(Parse.extractCurrency))
    assert(run(inputs, Cleaners.identifyCurrency(_)) ==
      inputs.map(s => Parse.identifyCurrency(s).orNull))
  }

  test("property type ladders == kernel") {
    val inputs = Seq("Villa for Sale", "Beautiful land plot", "TOWNHOUSE unit",
      "Modern home", "Hotel Resort", "Commercial space for Sale",
      "apartement unit", "weird thing")
    assert(run(inputs, Cleaners.standardizePropertyType(_)) ==
      inputs.map(Parse.standardizePropertyType))
    assert(run(inputs, Cleaners.definePropertyType(_)) ==
      inputs.map(s => Parse.definePropertyType(s)))
    assert(run(inputs, Cleaners.findPropertyType(_)) ==
      inputs.map(s => Parse.findPropertyType(s).orNull))
  }

  test("contract / misc string columns == kernel") {
    val ct = Seq("LEASEHOLD villa", "this is freehold", "rental only")
    assert(run(ct, Cleaners.findContractType(_)) == ct.map(Parse.findContractType))
    assert(run(ct, Cleaners.getContractType(_)) == ct.map(Parse.getContractType))
    val gf = Seq("3/4", "2-3", "1+2", "4 or 5", "plain")
    assert(run(gf, Cleaners.grabFirst(_)) == gf.map(Parse.grabFirst))
    val urls = Seq("https://www.example.com/page", "http://plain.com/x")
    assert(run(urls, Cleaners.getDomain(_)) ==
      urls.map(s => Parse.getDomain(s).orNull))
    val dims = Seq("https://x.com/img-300x200.jpg", "a-100x50.webp",
      "b-20x20.png", "plain.jpg")
    assert(run(dims, Cleaners.dimensionRemover(_)) == dims.map(Parse.dimensionRemover))
    val ac = Seq("Bedrooms: 3", "plain", "a:b:c")
    assert(run(ac, Cleaners.afterColon(_)) == ac.map(Parse.afterColon))
    val beds = Seq("Stunning 4 bedroom villa", "12 bedrooms total", "no beds",
      "3-bedroom house")
    assert(run(beds, Cleaners.findBedrooms(_)) ==
      beds.map(s => Parse.findBedrooms(s).map(Int.box).orNull))
  }

  test("bahasa lease years column == kernel") {
    val inputs = Seq("Harga 2 M utk 25 tahun", "harga nego untuk 30 tahun", "no bahasa")
    assert(run(inputs, Cleaners.findLeaseholdYearsBahasa(_)) ==
      inputs.map(s => Parse.findLeaseholdYearsBahasa(s).map(Int.box).orNull))
  }

  test("array-typed cleaners") {
    val df = Seq(
      (Seq("Available", "SOLD out"), "x"),
      (Seq("delisted item"), "y"),
      (Seq("nothing", "here"), "z")).toDF("labels", "k")
    val got = df.select(Cleaners.anySoldDelisted(col("labels"))).as[String].collect.toSeq
    assert(got == Seq("Sold", "Delisted", "Available"))
    val desc = Seq(Seq(" a ", "", "b")).toDF("rows")
      .select(Cleaners.constructDescription(col("rows"))).as[String].head
    assert(desc == "a\nb")
  }

  test("udfs == kernel") {
    val inputs = Seq("Rp. 2.500.000.000 nego", "2,5 M", "350 juta", "nothing")
    assert(run(inputs, c => Udfs.reExtractPrice(c)) ==
      inputs.map(s => Parse.reExtractPrice(s).map(Long.box).orNull))
    val lease = Seq("Leasehold until 2045", "25 years lease", "no info")
    assert(run(lease, c => Udfs.leaseholdYearsFinders(2026)(c)) ==
      lease.map(s => Parse.leaseholdYearsFinders(s, 2026).map(Int.box).orNull))
  }

  test("review regressions: leftmost currency, icon dups, rounding, dims") {
    // leftmost match wins in mixed-currency text (kernel == reference)
    val mixed = Seq("USD 250,000 (IDR 4.000.000.000)")
    assert(run(mixed, Cleaners.extractCurrency(_)) == mixed.map(Parse.extractCurrency))
    assert(Parse.extractCurrency(mixed.head) == "USD")
    // duplicate normalized keys: last value wins, no DUPLICATED_MAP_KEY
    val icons = Seq(Seq("Bedrooms: 2", "bedrooms: 3")).toDF("icons")
      .select(Cleaners.getIcons(col("icons"))).as[Map[String, String]].head
    assert(icons == Parse.getIcons(Seq("Bedrooms: 2", "bedrooms: 3")))
    assert(icons == Map("bedrooms" -> "3"))
    // half-even rounding like Python round()
    assert(run(Seq("2.125"), Cleaners.safeNumber(_)) ==
      Seq(Parse.safeNumber("2.125").map(Double.box).orNull))
    // first-match dim removed everywhere; webp-first removes nothing
    val dims = Seq("p-300x200/img-300x200.jpg", "a-1x1.webp b-2x2.jpg")
    assert(run(dims, Cleaners.dimensionRemover(_)) == dims.map(Parse.dimensionRemover))
    assert(Parse.dimensionRemover(dims.head) == "p/img.jpg")
    assert(Parse.dimensionRemover(dims(1)) == "a-1x1.webp b-2x2.jpg")
  }

  test("date cleaners") {
    val got = Seq("2026-03-15").toDF("d")
      .select(Cleaners.firstMonth(to_date(col("d")))).as[String].head
    assert(got == "2026-02-01")
    assert(run(Seq("2023-05-04 10:00:00"), Cleaners.toMmddyy(_)) == Seq("05/04/23"))
  }
}
