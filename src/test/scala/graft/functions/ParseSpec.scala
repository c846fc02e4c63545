package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Table-driven fidelity tests for the Parse kernel. Expected values were
  * produced by executing the reference implementation (reid/func.py and
  * reid/customs helpers) on each input — they are behavioral ground truth,
  * not hand-derived. Year-relative functions are pinned to asOfYear=2026,
  * the wall-clock year the fixtures were captured under.
  */
class ParseSpec extends AnyFunSuite {
  private val Y = 2026

  private def check[A](name: String, cases: Seq[(String, A)])(f: String => A): Unit =
    for ((in, want) <- cases)
      assert(f(in) == want, s"$name(${in.take(60)}) expected $want got ${f(in)}")

  test("toNumber matches reference to_number") {
    check("toNumber", Seq(
      "1,250,000" -> Some(1250000.0), "2.5" -> Some(2.5),
      "1.250.000" -> Some(1250000.0), "1,250.50" -> Some(1250.5),
      "  3 bedrooms " -> Some(3.0), "no digits" -> None,
      "450 sqm" -> Some(450.0), "1.5.2.3" -> Some(1523.0),
      "12.345" -> Some(12345.0), "7" -> Some(7.0),
      "100.25" -> Some(100.25), "0.5" -> Some(0.5)))(Parse.toNumber)
  }

  test("fixPrice matches reference fix_price") {
    check("fixPrice", Seq[(String, Option[Double])](
      "1.250.000,50" -> Some(1.2500005e8), "2,5" -> Some(2.5),
      "1,250.50" -> Some(1.2505), "1.250.000" -> Some(1250000.0),
      "12.5" -> Some(12.5), "1,000,000" -> Some(1000000.0),
      "3" -> Some(3.0), "250,000.75" -> Some(250.00075)))(Parse.fixPrice)
  }

  test("cleanPriceText matches reference clean_price_text") {
    check("cleanPriceText", Seq(
      "Rp. 2.500.000.000 nego" -> "2.500.000.000",
      "IDR 5 juta/m2" -> "idr 5 juta permeter",
      "2,5 M" -> "2,5 m",
      "750 juta per tahun" -> "750 juta",
      "USD 250,000 - negotiable" -> "usd 250,000",
      "Rp 1.5m bersih" -> "1.5m",
      "500/m2 rupiah" -> "500 permeter"))(Parse.cleanPriceText)
  }

  test("reExtractPrice matches reference re_extract_price") {
    check("reExtractPrice", Seq[(String, Option[Long])](
      "Rp. 2.500.000.000 nego" -> Some(2500000000L),
      "IDR 5 juta/m2" -> Some(5000000L),
      "2,5 M" -> Some(2500000000L),
      "750 juta per tahun" -> Some(750000000L),
      "USD 250,000 - negotiable" -> Some(0L),
      "Rp 1.5m bersih" -> Some(1500000000L),
      "500/m2 rupiah" -> Some(500L),
      "2.5 m" -> Some(2500000000L),
      "350 juta" -> Some(350000000L),
      "900 ribu" -> Some(900000L),
      "15 juta per meter" -> Some(15000000L),
      "price on request" -> Some(0L),
      "4.800.000.000" -> Some(4800000000L)))(Parse.reExtractPrice)
  }

  test("findUsd / findIdr match reference") {
    check("findUsd", Seq(
      "USD 1,250,000" -> Some(1250000L), "usd 350.000" -> Some(350000L),
      "Price: USD 85,500 only" -> Some(85500L), "IDR 5000" -> None,
      "USD1.5" -> Some(15L), "nothing" -> None))(Parse.findUsd)
    check("findIdr", Seq(
      "IDR 2.500.000.000" -> Some(2500000000L),
      "idr 5,000,000" -> Some(5000000L), "USD 100" -> None,
      "Harga IDR 750.000" -> Some(750000L)))(Parse.findIdr)
  }

  test("areToSqm matches reference are_to_sqm") {
    check("areToSqm", Seq(
      "5.5 are" -> Some(550L), "10 Are land" -> Some(1000L),
      "2,25 are" -> Some(225L), "450 sqm" -> None, // reference passes through
      "7 ares" -> Some(700L)))(Parse.areToSqm)
  }

  test("findLandSize / findBuildSize match reference") {
    check("findLandSize", Seq(
      "Land size: 450 m2 with garden" -> Some(450.0),
      "luas tanah 5.5 are" -> Some(550.0),
      "Total area 1,200 sqm" -> Some(1.2), // reference comma→dot artifact
      "about 350 sqm of land" -> Some(350.0),
      "3 are" -> Some(300.0), "no size here" -> None,
      "Land area 2.5 are ocean view" -> Some(250.0)))(Parse.findLandSize)
    check("findBuildSize", Seq(
      "Building size 250 m2" -> Some(250.0), "build 180 sqm" -> Some(180.0),
      "145 sqm built area" -> Some(145.0), "300 sqm building size" -> Some(300.0),
      "building 2.5 are" -> Some(250.0), "no info" -> None))(Parse.findBuildSize)
  }

  test("landsizeExtractor / buildsizeExtractor match reference") {
    check("landsizeExtractor", Seq(
      "Landsize 450 sqm\nnice villa" -> Some(450.0),
      "land size: 5 are and 200 m2\nLand Size info" -> Some(200.0),
      "Land for sale 1,000 m2" -> Some(1000.0),
      "450 sqm" -> None))(Parse.landsizeExtractor)
    check("buildsizeExtractor", Seq(
      "Villa of 250sqm on land" -> Some(250.0),
      "Building area 300sqm" -> Some(300.0),
      "villa 180 sqm" -> None, // re.match is anchored; lowercase v fails too
      "Building: 200m2" -> Some(200.0)))(Parse.buildsizeExtractor)
  }

  private val leaseCases = Seq(
    "Leasehold until 2045, price negotiable",
    "25 years lease remaining",
    "leasehold 30 years",
    "Freehold villa with 3 bedrooms",
    "lease until 2050",
    "Harga sudah nego 1 M utk 20 tahun",
    "lease expires 12/05/2040 on the year",
    "99 year lease",
    "Available leasehold: 22 year term\nsecond line lease 2044",
    "2035",
    "price until 2042")

  test("countLeaseYears matches reference count_lease_years") {
    val want = Seq(Some(19), Some(25), Some(30), None, Some(24), None,
      Some(14), Some(99), Some(22), None, None)
    check("countLeaseYears", leaseCases.zip(want))(Parse.countLeaseYears(_, Y))
  }

  test("findLeaseYears matches reference find_lease_years") {
    val want = Seq(Some(19), Some(25), Some(30), None, Some(24), None,
      Some(14), Some(99), Some(22), None, Some(16))
    check("findLeaseYears", leaseCases.zip(want))(Parse.findLeaseYears(_, Y))
  }

  test("getLeaseYears matches reference get_lease_years") {
    val want = Seq(Some((19.0, true)), Some((25.0, true)), Some((30.0, true)),
      None, Some((24.0, true)), None, Some((14.0, true)), Some((99.0, true)),
      Some((22.0, true)), Some((9.0, true)), Some((16.0, true)))
    check("getLeaseYears", leaseCases.zip(want))(Parse.getLeaseYears(_, Y))
    assert(Parse.getLeaseYears("2,5 years left on lease", Y) == Some((2.5, false)))
  }

  test("searchLeaseholdYears matches reference search_leasehold_years") {
    val want = Seq(Vector(19), Vector(25), Vector(30), Vector(), Vector(24),
      Vector(), Vector(12), Vector(99), Vector(22, 18), Vector(), Vector())
    check("searchLeaseholdYears", leaseCases.zip(want))(Parse.searchLeaseholdYears(_, Y))
  }

  test("findLeaseholdYearsBahasa matches reference") {
    check("bahasa", Seq(
      "Harga 2 M utk 25 tahun" -> Some(25),
      "harga nego untuk 30 tahun" -> None,
      "no bahasa" -> None))(Parse.findLeaseholdYearsBahasa)
  }

  test("findYears (dotproperty) matches reference") {
    check("findYears", Seq(
      "lease until 2045" -> Some(19), "25 th remaining" -> Some(25),
      "1985 built" -> None, "nothing" -> None))(Parse.findYears(_, Y))
  }

  test("getUploadedDate matches reference get_uploaded_date") {
    check("getUploadedDate", Seq(
      "https://x.com/wp-content/uploads/2023-12-01/img.jpg" -> Some("12/01/23"),
      "https://x.com/20231201-villa.jpg" -> Some("12/01/23"),
      "https://x.com/2023/11/pic.png" -> Some("11/01/23"),
      "https://x.com/uploads/2023-25-03/a.jpg" -> Some("03/25/23"), // m/d swap
      "https://x.com/9923-12-01/a.jpg" -> None,
      "nothing" -> None))(Parse.getUploadedDate)
  }

  test("property type ladders match reference") {
    val inputs = Seq("Villa for Sale", "Beautiful land plot", "TOWNHOUSE unit",
      "Modern home", "Hotel Resort", "Commercial space for Sale",
      "apartement unit", "weird thing")
    check("standardize", inputs.zip(Seq("Villa", "Land", "Townhouse", "House",
      "Hotel", "Commercial", "Apartment", "weird thing")))(Parse.standardizePropertyType)
    check("define", inputs.zip(Seq("Villa", "Land", "House", "House", "Hotel",
      "Villa", "Apartement", "Villa")))(Parse.definePropertyType(_))
    check("find", inputs.zip(Seq(Some("Villa"), Some("Land"), Some("House"),
      Some("Home"), None, None, Some("Apartement"), None)))(Parse.findPropertyType)
  }

  test("contract type matches reference") {
    check("findContractType", Seq(
      "LEASEHOLD villa" -> "Leasehold", "this is freehold" -> "Freehold",
      "rental only" -> "rental only"))(Parse.findContractType)
    check("getContractType", Seq(
      "LEASEHOLD villa" -> "Leasehold",
      "rental only" -> "Freehold"))(Parse.getContractType)
  }

  test("currency extraction matches reference") {
    check("extractCurrency", Seq(
      "price IDR 500" -> "IDR", "USD 1000" -> "USD", "Rp 2.500" -> "Rp",
      "IDR2500000" -> "IDR2500000", "USD350000" -> "USD350000",
      "Rp5000" -> "Rp5000", "euros only" -> "euros only"))(Parse.extractCurrency)
    check("identifyCurrency", Seq(
      "price IDR 500" -> Some("IDR"), "USD 1000" -> Some("USD"),
      "Rp 2.500" -> Some("IDR"), "euros only" -> None))(Parse.identifyCurrency)
  }

  test("bedrooms match reference") {
    check("findBedrooms", Seq(
      "Stunning 4 bedroom villa" -> Some(4), "12 bedrooms total" -> Some(12),
      "no beds" -> None, "3-bedroom house" -> None))(Parse.findBedrooms)
    check("findBedroomsInDescription", Seq(
      "villa with 2 bathrooms and 4 bedroom" -> Some(4),
      "5 guests, 3 bedroom villa" -> Some(3),
      "10 are land 4 bedroom" -> Some(4),
      "no bedroom number" -> None,
      "Bedroom: nice" -> None))(Parse.findBedroomsInDescription)
  }

  test("string helpers match reference") {
    check("getDomain", Seq(
      "https://www.example.com/page" -> Some("www.example.com"),
      "http://plain.com/x" -> None))(Parse.getDomain) // https-only, as reference
    check("grabFirst", Seq("3/4" -> "3", "2-3" -> "2", "1+2" -> "1",
      "4 or 5" -> "4 ", "plain" -> "plain"))(Parse.grabFirst)
    check("dimensionRemover", Seq(
      "https://x.com/img-300x200.jpg" -> "https://x.com/img.jpg",
      "a-100x50.webp" -> "a-100x50.webp", // reference never strips webp
      "b-20x20.png" -> "b.png",
      "plain.jpg" -> "plain.jpg"))(Parse.dimensionRemover)
    check("afterColon", Seq("Bedrooms: 3" -> "3", "plain" -> "plain",
      "a:b:c" -> "c"))(Parse.afterColon)
    check("findLocationInDescription", Seq(
      "Nice villa. Location: Canggu beach side" -> Some("Canggu"),
      "no loc" -> None,
      "LOCATION: Ubud" -> Some("Ubud")))(Parse.findLocationInDescription)
    check("findLocationInTitle", Seq(
      "Villa in Seminyak for sale" -> Some("Seminyak"),
      "Land plot Bali" -> None))(Parse.findLocationInTitle)
  }

  test("availability flags match reference") {
    assert(Parse.anySoldDelisted(Seq("Available", "SOLD out")) == "Sold")
    assert(Parse.anySoldDelisted(Seq("delisted item")) == "Delisted")
    assert(Parse.anySoldDelisted(Seq("nothing", "here")) == "Available")
    assert(Parse.findOffPlan("OFF-PLAN villa", ""))
    assert(Parse.findOffPlan("nice", "still offplan project"))
    assert(!Parse.findOffPlan("done", "ready"))
    check("checkPerMeter", Seq("5 juta/m2" -> true,
      "IDR 100 per meter" -> true, "500 juta" -> false))(Parse.checkPerMeter)
  }

  test("date helpers") {
    import java.time.LocalDate
    assert(Parse.firstMonth(LocalDate.of(2026, 3, 15)) == "2026-02-01")
    assert(Parse.firstMonth(LocalDate.of(2026, 1, 2)) == "2025-12-01")
    assert(Parse.timeAgoToDatetime("3 months ago", LocalDate.of(2026, 8, 12))
      == Some("05/14/26"))
    assert(Parse.timeAgoToDatetime("2 weeks ago", LocalDate.of(2026, 8, 12))
      == Some("07/29/26"))
    assert(Parse.timeAgoToDatetime("yesterday-ish", LocalDate.of(2026, 8, 12))
      == Some("yesterday-ish"))
    assert(Parse.toMmddyy("2023-05-04 10:00:00") == Some("05/04/23"))
    assert(Parse.extractPublishDate("x/20231201-a.jpg")
      == Some(LocalDate.of(2023, 12, 1)))
  }

  test("fuzz corpus: re_extract_price / to_number / clean_price_text match reference") {
    // (input, re_extract_price, to_number, clean_price_text) captured by
    // executing the reference on 40 generated price strings (seed 7)
    val fuzz: Seq[(String, Long, Double, String)] = Seq(
      ("Rp950 per meter", 950L, 950.0, "950 permeter"),
      ("2 rupiah", 2L, 2.0, "2"),
      ("Rp. 2,5.00", 2L, 2500.0, "2,5\\,00"),
      ("USD 2 ribu", 2000L, 2.0, "usd 2 ribu"),
      ("2 per meter", 2L, 2.0, "2 permeter"),
      ("12.345.678 ribu", 12345678000L, 12345678.0, "12.345.678 ribu"),
      ("USD 2,5 per meter", 2L, 25.0, "usd 2,5 permeter"),
      ("USD 2 juta", 2000000L, 2.0, "usd 2 juta"),
      ("USD 1.250.000", 0L, 1250000.0, "usd 1.250.000"),
      ("USD 2 jt", 2000000L, 2.0, "usd 2 jt"),
      ("IDR 3,75 jt", 3750000L, 375.0, "idr 3,75 jt"),
      ("USD 2,5 M", 2500000000L, 25.0, "usd 2,5 m"),
      ("1.250.00", 1L, 125000.0, "1.250\\,00"),
      ("Rp. 1.250.000 juta", 1250000000000L, 1250000.0, "1.250.000 juta"),
      ("USD 2,5", 0L, 25.0, "usd 2,5"),
      ("IDR 1.250.000 rupiah", 0L, 1250000.0, "idr 1.250.000"),
      ("Rp. 12.345.678 nego", 12345678L, 12345678.0, "12.345.678"),
      ("Rp. 1,250.50 M", 1250500000L, 125050.0, "1,250.50 m"),
      ("Rp1.250.000 ribu", 1250000000L, 1250000.0, "1.250.000 ribu"),
      ("Rp. 1,250.50 nego", 1L, 125050.0, "1,250.50"),
      ("USD 3,75 juta", 3750000L, 375.0, "usd 3,75 juta"),
      ("Rp. 1.250 jt", 1250000L, 1250.0, "1.250 jt"),
      ("IDR 1,250.50", 0L, 1250.5, "idr 1,250.50"),
      ("USD 2,5.00", 0L, 25.0, "usd 2,5\\,00"),
      ("Rp. 950/m2", 950L, 9502.0, "950 permeter"),
      ("USD 1,250.50 nego", 0L, 1250.5, "usd 1,250.50"),
      ("2,5 M", 2500000000L, 25.0, "2,5 m"),
      ("1,250.50", 1L, 1250.5, "1,250.50"),
      ("USD 3,75 nego", 0L, 375.0, "usd 3,75"),
      ("IDR 3,75/m2", 3L, 3752.0, "idr 3,75 permeter"),
      ("IDR 2/m2", 2L, 22.0, "idr 2 permeter"),
      ("USD 1.250 juta", 1250000L, 1250.0, "usd 1.250 juta"),
      ("1,250.50 ribu", 1250L, 1250.5, "1,250.50 ribu"),
      ("Rp3,75 ribu", 3750L, 375.0, "3,75 ribu"),
      ("IDR 12.345.678 nego", 0L, 12345678.0, "idr 12.345.678"),
      ("Rp2,5 nego", 2L, 25.0, "2,5"),
      ("USD 12.345.678 M", 12345678000000000L, 12345678.0, "usd 12.345.678 m"))
    for ((in, rep, tn, cpt) <- fuzz) {
      assert(Parse.cleanPriceText(in) == cpt, s"clean($in)")
      assert(Parse.reExtractPrice(in) == Some(rep), s"reExtract($in)")
      assert(Parse.toNumber(in) == Some(tn), s"toNumber($in)")
    }
  }

  test("second ground-truth batch: misc scalar functions") {
    assert(Parse.safeNumber("12") == Some(12.0))
    assert(Parse.safeNumber("12.344") == Some(12.34))
    assert(Parse.safeNumber("abc") == None)
    assert(Parse.priceRequestToZero("PRICE REQUEST now") == Some("0"))
    assert(Parse.priceRequestToZero("500") == Some("500"))
    assert(Parse.recalculatePriceByLandSize("5 juta /are", 5000000, 500)
      == Some(2.5e7))
    assert(Parse.recalculatePriceByLandSize("1m /m2", 100, 300) == None)
    assert(Parse.recalculatePriceByLandSize("plain", 100, 300) == None)
    assert(Parse.recalculatePriceByLandSize("x /are", 200, 0) == None)
    assert(Parse.grabPrice("IDR 5.000") == (Some("idr 5.000"), None))
    assert(Parse.grabPrice("usd 300") == (None, Some("usd 300")))
    assert(Parse.findHoldState(Seq("free hold")) == (false, false))
    assert(Parse.ubudFindLeaseholdYears("2.5 Year left", Y) == Some(2.5))
    assert(Parse.ubudFindLeaseholdYears("2040", Y) == Some(14.0))
    assert(Parse.ubudFindLeaseholdYears("1999", Y) == None)
    assert(Parse.leaseholdYearsFinders("Leasehold until 2045", Y) == Some(19))
    assert(Parse.leaseholdYearsFinders("Harga 2 M utk 22 tahun", Y) == Some(22))
    assert(Parse.leaseholdYearsFinders("no info", Y) == None)
    assert(Parse.getImgSrc("url(https://x.com/a.jpg)") == Some("https://x.com/a.jpg"))
    assert(Parse.getBackgroundImage("background-image:url(https://x/a.jpg);")
      == "https://x/a.jpg")
    assert(Parse.getBackgroundImage("nope") == "nope")
    assert(Parse.findPublishedDate("{\"datePublished\":\"2023-11-05T10:00:00+08:00\"}")
      == Some("11/05/23"))
    assert(Parse.findPublishedDate("{\"datePublished\":\"2024-03-05T08:30:00\"}")
      == Some("03/05/24")) // offset-less, like Python fromisoformat
    assert(Parse.findPublishedDate("{\"datePublished\":\"2024-03-05\"}")
      == Some("03/05/24")) // bare date
    assert(Parse.findPublishedDate("none here") == Some(""))
    assert(Parse.finder("(\\d+) beds", "has 4 beds", 1) == Some("4"))
    assert(Parse.finder("x", "y") == None)
  }

  test("misc processors") {
    assert(Parse.findHoldState(Seq("Lease Hold", "x")) == (true, false))
    assert(Parse.findHoldState(Seq("SOLD")) == (false, true))
    assert(Parse.getIcons(Seq("Bedrooms: 3", "Land Size: 500 m2")) ==
      Map("bedrooms" -> "3", "land_size" -> "500 ")) // trailing space: m2 dropped after strip
    assert(Parse.baliVillaSalesPrice("IDR 2.5m / 25 years") ==
      (Some("idr 2.5m "), None, Some(" 25 years"), "Available"))
    assert(Parse.leaseOrFreeHold("For lease") == "Leasehold")
    assert(Parse.leaseOrFreeHold("For sale") == "Freehold")
    assert(Parse.faRemover("fas fa-bed") == Some("bed"))
    assert(Parse.findPageNumber("https://x.com/?cpage=7") == 7)
    assert(Parse.findCode("KIBR123 (Villa)") == "KIBR123")
    assert(Parse.constructDescription(Seq(" a ", "", "b")) == "a\nb")
    assert(Parse.grabPrice("IDR 500") == (Some("idr 500"), None))
    assert(Parse.isSold("SOLD") == "Sold")
    assert(Parse.isSold("listed") == "Available")
    assert(Parse.ubudFindLeaseholdYears("lease 2045 or 20 year", Y)
      == Some(20.0).map(math.max(_, 19.0))) // max(|2045-2026|=19, 20.0)
  }

  test("second review batch regressions") {
    // >19-digit junk yields None, never a NumberFormatException
    assert(Parse.findIdr("IDR 10.000.000.000.000.000.000") == None)
    assert(Parse.findUsd("USD 99999999999999999999") == None)
    // lstrip character-set semantics
    assert(Parse.faRemover("fa fa-arrows") == Some("rrows"))
    assert(Parse.faRemover("fas fa-anchor") == Some("nchor"))
    // Python float-typed "25.0" is rejected by the FindLeaseYears check
    assert(Parse.toNumberTyped("25.0") == Some((25.0, false)))
    assert(Parse.toNumberTyped("25") == Some((25.0, true)))
    assert(Parse.findLeaseYearsProcessor(
      Seq("price negotiable for 25.0 year period"), Y) == None)
    assert(Parse.findLeaseYearsProcessor(Seq("for 25 year period"), Y) == Some(25))
  }
}
