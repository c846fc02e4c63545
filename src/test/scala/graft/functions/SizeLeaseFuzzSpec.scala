package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Fuzz fidelity for the messiest parser families: land/build size
  * extraction and the four leasehold-years strategies. 60 generated
  * inputs (seeds 11) executed through the reference implementation; the
  * kernel must reproduce every output, including the negative deltas from
  * past 4-digit years and the comma→dot parse artifacts.
  */
class SizeLeaseFuzzSpec extends AnyFunSuite {
  private val Y = 2026

  test("size parsers match reference on fuzz corpus") {
    // (input, find_land_size, find_build_size, landsize_extractor, buildsize_extractor)
    val cases: Seq[(String, Option[Double], Option[Double], Option[Double], Option[Double])] = Seq(
      ("plot: 0.8 sq. meter with extras 0.8", None, None, None, None),
      ("plot: 1,200 sq. meter with extras 0.8sq. meter", None, None, None, None),
      ("luas tanah: 2.5  with extras 1.250m²", None, None, None, None),
      ("Total area: 450 m² with extras 5,5sqm", Some(5.5), Some(5.5), None, None),
      ("land area: 1.250  with extras 12square meter", Some(12), None, None, None),
      ("Land size: 1.250 m² with extras 1,200square meter", Some(1.2), None, None, None),
      ("Total area: 1.250 m2 with extras 0.8sq. meter", Some(1.25), None, None, None),
      ("land area: 450 m2 with extras 2.5sqm", Some(450), Some(2.5), None, None),
      ("Land size: 0.8 m² with extras 5,5m²", None, None, None, None),
      ("luas tanah: 1.250 sqm with extras 12are", Some(1.25), Some(1.25), None, None),
      ("plot: 450 square meter with extras 450m²", None, None, None, None),
      ("Building size: 1,200 sq. meter with extras 0.8m2", None, Some(1.2), None, Some(0.8)),
      ("Building size: 5,5  with extras 2.5sq. meter", None, Some(5.5), None, None),
      ("Building size: 450 m2 with extras 1.250", None, Some(450), None, None),
      ("land area: 1,200 m2 with extras 0.8are", Some(1.2), Some(80.0), None, None),
      ("villa of: 450 m2 with extras 0.8square meter", None, None, None, None),
      ("Land size: 2.5 sqm with extras 450m²", Some(2.5), Some(2.5), Some(2.5), None),
      ("villa of: 12 m² with extras 1,200m2", None, None, None, Some(1200)),
      ("luas tanah: 0.8 square meter with extras 5,5are", Some(0.8), Some(550.0), None, None),
      ("land area: 5,5 are with extras 450m²", Some(550.0), Some(550.0), None, None),
      ("land area: 2.5 sqm with extras 12m2", Some(2.5), Some(2.5), None, None),
      ("Land size: 450 m² with extras 0.8m²", None, None, None, None),
      ("Total area: 12 sq. meter with extras 2.5m²", Some(12), None, None, None),
      ("luas tanah: 12  with extras 2.5m²", None, None, None, None),
      ("villa of: 450 m² with extras 1,200sqm", Some(1.2), Some(1.2), None, Some(1200)),
      ("Land size: 5,5  with extras 0.8sq. meter", Some(0.8), None, None, None),
      ("Building size: 450 sqm with extras 2.5m²", Some(450), Some(450), None, None),
      ("land area: 450 sqm with extras 2.5m²", Some(450), Some(450), None, None),
      ("Building size: 450  with extras 1.250are", Some(125.0), Some(450), None, Some(1250)),
      ("Building size: 1,200 m2 with extras 450m2", None, Some(1.2), None, Some(450)))
    for ((in, land, build, landEx, buildEx) <- cases) {
      assert(Parse.findLandSize(in) == land, s"findLandSize($in)")
      assert(Parse.findBuildSize(in) == build, s"findBuildSize($in)")
      assert(Parse.landsizeExtractor(in) == landEx, s"landsizeExtractor($in)")
      assert(Parse.buildsizeExtractor(in) == buildEx, s"buildsizeExtractor($in)")
    }
  }

  test("leasehold strategies match reference on fuzz corpus") {
    // (input, count_lease_years, find_lease_years, get_lease_years, search_leasehold_years)
    val cases: Seq[(String, Option[Int], Option[Int], Option[Int], Vector[Int])] = Seq(
      ("years 05 2019 leasehold", Some(5), None, Some(-7), Vector()),
      ("30 th utk utk 18\nsecond lease 2044 line", Some(18), Some(18), Some(18), Vector(18)),
      ("years 18 years 2019\nsecond lease 2044 line", Some(18), Some(18), Some(18), Vector(18)),
      ("25 expires 2030 utk. dot 22 year part", Some(22), None, Some(22), Vector()),
      ("year 2019 expires nothing\nsecond lease 2044 line", Some(18), Some(18), Some(-7), Vector(18)),
      ("lease harga 18 99\nsecond lease 2044 line", Some(18), Some(18), Some(18), Vector(18, 18)),
      ("years 2030 2019 leasehold", Some(4), Some(4), Some(4), Vector()),
      ("2045 leasehold nothing freehold", Some(19), Some(19), Some(19), Vector()),
      ("nothing until price 99", None, None, None, Vector()),
      ("7 2030 year price\nsecond lease 2044 line", Some(18), Some(18), Some(4), Vector(18)),
      ("until 12/05/2040 18 lease. dot 22 year part", Some(22), Some(18), Some(22), Vector(22)),
      ("nothing 2045 until freehold", None, None, Some(19), Vector()),
      ("05 2045 price expires\nsecond lease 2044 line", Some(18), Some(18), Some(19), Vector(18)),
      ("2045 utk 2030 utk\nsecond lease 2044 line", Some(18), Some(18), Some(19), Vector(18)),
      ("expires expires 7 05. dot 22 year part", Some(22), None, Some(22), Vector()),
      ("year 05 2045 lease", Some(19), Some(19), Some(19), Vector()),
      ("tahun 30 th lease utk\nsecond lease 2044 line", Some(18), Some(30), Some(18), Vector(18)),
      ("freehold 2019 18 harga\nsecond lease 2044 line", Some(18), Some(18), Some(-7), Vector(18)),
      ("years nothing expires 7", Some(7), None, Some(7), Vector()),
      ("2035 05 years years", Some(9), Some(9), None, Vector()),
      ("7 2030 price leasehold\nsecond lease 2044 line", Some(18), Some(4), Some(4), Vector(18)),
      ("price 12/05/2040 years tahun. dot 22 year part", Some(22), Some(14), Some(22), Vector()),
      ("until 2030 30 th until. dot 22 year part", Some(22), None, Some(22), Vector()),
      ("7 05 year year\nsecond lease 2044 line", Some(18), Some(18), None, Vector(18)),
      ("nothing leasehold price 2019. dot 22 year part", Some(22), None, Some(22), Vector(-7, 22)),
      ("30 th 05 lease lease", None, Some(30), None, Vector()),
      ("12/05/2040 price freehold 2030", None, Some(14), Some(14), Vector()),
      ("until years 05 12/05/2040", Some(14), Some(14), Some(14), Vector()),
      ("2035 freehold expires tahun\nsecond lease 2044 line", Some(18), Some(18), Some(9), Vector(18)),
      ("nothing price harga 7", None, None, None, Vector()))
    for ((in, cnt, fnd, get, srch) <- cases) {
      assert(Parse.countLeaseYears(in, Y) == cnt, s"countLeaseYears($in)")
      assert(Parse.findLeaseYears(in, Y) == fnd, s"findLeaseYears($in)")
      assert(Parse.getLeaseYears(in, Y).map(_._1.toInt) == get, s"getLeaseYears($in)")
      assert(Parse.searchLeaseholdYears(in, Y) == srch, s"searchLeaseholdYears($in)")
    }
  }
}
