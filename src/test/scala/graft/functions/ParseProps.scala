package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based parser invariants (SURVEY §5.2): round-trips on
  * canonical formats, unit conversions, and sanity bounds for the
  * leasehold cascade.
  */
object ParseProps extends Properties("Parse") {

  private val smallInt = Gen.choose(1, 999999)

  property("toNumber inverts comma-grouped integers") =
    forAll(smallInt) { n =>
      val formatted = "%,d".format(n.toLong)
      Parse.toNumber(formatted) == Some(n.toDouble)
    }

  property("toNumber inverts two-decimal amounts") =
    forAll(Gen.choose(1, 99999), Gen.choose(0, 99)) { (whole, cents) =>
      val s = f"$whole%d.$cents%02d"
      Parse.toNumber(s) == Some(s.toDouble)
    }

  property("areToSqm multiplies ares by 100") =
    forAll(Gen.choose(1, 1000)) { n =>
      Parse.areToSqm(s"$n are") == Some(n * 100L)
    }

  property("reExtractPrice juta multiplier") =
    forAll(Gen.choose(1, 999)) { n =>
      Parse.reExtractPrice(s"$n juta") == Some(n * 1000000L)
    }

  property("reExtractPrice is never negative") =
    forAll(Gen.alphaNumStr.suchThat(_.length < 40)) { s =>
      Parse.reExtractPrice(s).forall(_ >= 0L)
    }

  property("searchLeaseholdYears sub-century candidates bounded by 100") =
    forAll(Gen.choose(10, 99), Gen.oneOf("lease", "leasehold")) { (n, kw) =>
      Parse.searchLeaseholdYears(s"$kw of $n years", 2026).forall(v => v <= 100)
    }

  property("findBedrooms round-trips 1..99") =
    forAll(Gen.choose(1, 99)) { n =>
      Parse.findBedrooms(s"Nice $n bedroom villa") == Some(n)
    }

  property("identifyCurrency finds planted tokens") =
    forAll(Gen.oneOf("IDR", "Rp", "USD"), smallInt) { (cur, n) =>
      val expected = if (cur == "USD") "USD" else "IDR"
      Parse.identifyCurrency(s"price $cur $n") == Some(expected)
    }

  property("cleanPriceText is idempotent on its own output for plain numbers") =
    forAll(smallInt) { n =>
      val once = Parse.cleanPriceText(n.toString)
      Parse.cleanPriceText(once) == once
    }

  property("getUploadedDate validates year prefix") =
    forAll(Gen.choose(2000, 2099), Gen.choose(1, 12), Gen.choose(1, 28)) {
      (y, m, d) =>
        Parse.getUploadedDate(f"https://x.com/$y%04d-$m%02d-$d%02d/img.jpg") ==
          Some(f"$m%02d/$d%02d/${y % 100}%02d")
    }
}
