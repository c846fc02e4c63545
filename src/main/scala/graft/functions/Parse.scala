package graft.functions

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import java.util.regex.Pattern

/** Pure-Scala parsing kernel: the reference's scalar function library
  * (reid/func.py, ~950 LoC + the reid/customs helpers) re-implemented as
  * `String => Option[...]` functions with no Spark dependency, so every
  * parser is unit-testable standalone and wrappable as a UDF (Udfs.scala).
  *
  * Wall-clock discipline: every function whose reference counterpart calls
  * datetime.now() (reid/func.py:410-413,553-557,884-889) takes an explicit
  * `asOfYear`/`asOf` parameter — determinism requirement (SURVEY §7.4.4).
  *
  * Fidelity notes: where the reference would throw (e.g. int("") on a
  * stray separator) we return None; where it returns a raw pass-through
  * string into a numeric slot we return None. Each is flagged inline.
  */
object Parse {

  private def re(p: String): Pattern = Pattern.compile(p)
  private def reCI(p: String): Pattern =
    Pattern.compile(p, Pattern.CASE_INSENSITIVE)

  private def findFirst(p: Pattern, s: String): Option[String] = {
    val m = p.matcher(s)
    if (m.find()) Option(m.group()) else None
  }

  private def findGroup(p: Pattern, s: String, g: Int): Option[String] = {
    val m = p.matcher(s)
    if (m.find()) Option(m.group(g)) else None
  }

  private def findAll(p: Pattern, s: String): Vector[String] = {
    val m = p.matcher(s)
    val b = Vector.newBuilder[String]
    while (m.find()) b += m.group()
    b.result()
  }

  private def findAllGroup(p: Pattern, s: String, g: Int): Vector[String] = {
    val m = p.matcher(s)
    val b = Vector.newBuilder[String]
    while (m.find()) if (m.group(g) != null) b += m.group(g)
    b.result()
  }

  private def toDoubleOpt(s: String): Option[Double] =
    try Some(s.toDouble)
    catch { case _: NumberFormatException => None }

  private def toLongOpt(s: String): Option[Long] =
    try Some(s.toLong)
    catch { case _: NumberFormatException => None } // >19 digits: junk, not a crash

  /** Render a parsed number the way Python str() renders an int-or-float:
    * whole values came from digit-only strings → no ".0" suffix.
    */
  private def pyNumStr(d: Double): String =
    if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private val digitRun = re("[0-9.]+")
  private val hasDigit = re("\\d")

  // ---------------------------------------------------------------- numbers

  /** Locale-disambiguating numeric parse (reference reid/func.py:18-32):
    * strip commas, join digit/dot runs, count dots over the whole string;
    * one dot with <=2 decimals is a decimal point, anything else means
    * thousands separators and every dot is dropped.
    */
  def toNumber(value: String): Option[Double] =
    toNumberTyped(value).map(_._1)

  /** toNumber plus Python's int-vs-float distinction: the result is a
    * float only when the surviving string keeps a decimal point (one dot,
    * ≤2 decimals) — eval("25.0") is a float even though the value is
    * whole, which FindLeaseYears-style type checks care about.
    */
  def toNumberTyped(value: String): Option[(Double, Boolean)] = {
    if (value == null) return None
    val v = value.replace(",", "")
    val runs = findAll(digitRun, v).filter(r => hasDigit.matcher(r).find())
    if (runs.isEmpty) None
    else {
      val joined = runs.mkString
      val dots = v.count(_ == '.')
      val dec = if (dots == 1) joined.split("\\.", -1).last.length else 0
      val keepDot = !(dots > 1 || dec > 2)
      val cleaned = if (keepDot) joined else joined.replace(".", "")
      val isInt = !(keepDot && cleaned.contains("."))
      toDoubleOpt(cleaned).map(d => (d, isInt))
    }
  }

  /** reference reid/func.py:99-112: comma/dot swap heuristics; all counts
    * taken from the ORIGINAL text, transforms applied in declaration order.
    */
  def fixPrice(text: String): Option[Double] = {
    if (text == null) return None
    val dots = text.count(_ == '.')
    val commas = text.count(_ == ',')
    var t = text
    if (commas == 1 && dots == 1) { t = t.replace(".", ""); t = t.replace(",", ".") }
    if (commas == 1) t = t.replace(",", ".")
    else if (commas > 1) t = t.replace(",", "")
    if (dots > 1) t = t.replace(".", "")
    findFirst(digitRun, t).flatMap(toDoubleOpt)
  }

  /** reference reid/func.py:64-96: Indonesian price-text normalization —
    * 20 ordered substitutions then split on dash. Order is semantic.
    */
  def cleanPriceText(value: String): String = {
    if (value == null) return null
    var v = value.toLowerCase
    v = v.replaceAll("/", " per ")
    v = v.replaceAll("\\s+", " ")
    v = v.replaceAll("per$|-$", "")
    v = v.replaceAll("^rp\\.?", "")
    v = v.replaceAll("rupia$|rupiah|bersih", "")
    // the reference's replacement r"\,00" emits a LITERAL backslash before
    // the comma (Python keeps the unknown escape) — faithful, and it
    // matters: the backslash blocks the later "bare number" price branch
    v = v.replaceAll("\\.00$", "\\\\,00")
    v = v.replaceAll("m2", "meter")
    v = v.replaceAll("per m$", "permeter")
    v = v.replaceAll("per(.*?)meter", "permeter")
    v = v.replaceAll("juta(.*?)per(.*?)meter", "juta permeter")
    v = v.replaceAll("jjuta", "juta")
    v = v.replaceAll("mete$|meteer", "meter")
    v = v.replaceAll("per\\s*tahun", "pertahun")
    v = v.replaceAll("pertahun", "")
    v = v.replaceAll("nego|neg$", "")
    v = v.replaceAll("_|\\)|\\(", "")
    v = v.split("-", -1)(0)
    v.trim
  }

  /** reference reid/func.py:115-122 */
  def checkPerMeter(value: String): Boolean =
    value != null && re("per(.*?)meter").matcher(cleanPriceText(value)).find()

  private val pMilliar = re("[0-9.,]+\\s*m")
  private val pNum = re("[0-9.,]+")
  private val pAlpha = re("[a-z]")
  private val pJutaEnd = re("[0-9.,]+\\s*(juta|jt)$")
  private val pRibuEnd = re("([0-9.,]+)(.*?)ribu$")
  private val pPerMeter = re("([0-9.,]+)\\s*per\\s*meter")
  private val pJutaPerMeter = re("([0-9.,]+)\\s*(juta|jt)\\s*per\\s*meter")
  private val pRibuPerMeter = re("([0-9.,]+)\\s*(ribu|rb)\\s*per\\s*meter")

  /** reference reid/func.py:125-158: multi-pattern price cascade —
    * "1.5 m"→×1e9, bare number, juta→×1e6, ribu→×1e3, per-meter variants;
    * fallthrough 0. Where the reference passes a non-numeric match string
    * through (first branch, non-digit start) we return None.
    */
  def reExtractPrice(value: String): Option[Long] = {
    if (value == null) return None
    val t = cleanPriceText(value)
    findFirst(pMilliar, t) match {
      case Some(w) =>
        return if (w.nonEmpty && w.charAt(0).isDigit)
          fixPrice(w).map(d => (d * 1e9).toLong)
        else None // reference returns the raw string here
      case None =>
    }
    findFirst(pNum, t) match {
      case Some(w) if !pAlpha.matcher(t).find() =>
        return fixPrice(w).map(_.toLong)
      case _ =>
    }
    findFirst(pJutaEnd, t) match {
      case Some(w) if w.nonEmpty && w.charAt(0).isDigit =>
        return fixPrice(w).map(d => (d * 1e6).toLong)
      case _ =>
    }
    findGroup(pRibuEnd, t, 1) match {
      case Some(w) => return fixPrice(w).map(d => (d * 1e3).toLong)
      case None =>
    }
    findGroup(pPerMeter, t, 1) match {
      case Some(w) => return fixPrice(w).map(_.toLong)
      case None =>
    }
    findGroup(pJutaPerMeter, t, 1) match {
      case Some(w) => return fixPrice(w).map(d => (d * 1e6).toLong)
      case None =>
    }
    findGroup(pRibuPerMeter, t, 1) match {
      case Some(w) => return fixPrice(w).map(d => (d * 1e3).toLong)
      case None =>
    }
    Some(0L)
  }

  private val pUsd = reCI("USD\\s*([0-9.,]+)")
  private val pIdr = reCI("IDR\\s*([0-9.,]+)")
  private val pIntOnly = re("^\\d+$")

  /** reference reid/func.py:40-50: "USD 1,250.000" — commas stripped, then
    * integer parse, dots stripped on failure.
    */
  def findUsd(text: String): Option[Long] = {
    if (text == null) return None
    findGroup(pUsd, text, 1).flatMap { raw =>
      val p = raw.replace(",", "")
      if (pIntOnly.matcher(p).matches()) toLongOpt(p)
      else {
        val q = p.replace(".", "")
        if (pIntOnly.matcher(q).matches() && q.nonEmpty) toLongOpt(q)
        else None // reference would throw on a bare separator
      }
    }
  }

  /** reference reid/func.py:53-61: IDR strips both separators. */
  def findIdr(text: String): Option[Long] = {
    if (text == null) return None
    findGroup(pIdr, text, 1).flatMap { raw =>
      val p = raw.replace(",", "").replace(".", "")
      if (pIntOnly.matcher(p).matches() && p.nonEmpty) toLongOpt(p) else None
    }
  }

  /** reference reid/func.py:322-344: "5.5 are" → 550 sqm (int); non-"are"
    * strings pass through unchanged (None here = keep original).
    */
  def areToSqm(value: String): Option[Long] = {
    if (value == null) return None
    findGroup(reCI("([0-9.,]+)\\s*are"), value, 1).flatMap { raw =>
      toDoubleOpt(raw.replace(",", ".")).map(d => (d * 100).toLong)
    }
  }

  /** reference reid/func.py:302-319 */
  def safeNumber(value: String): Option[Double] =
    toDoubleOpt(if (value == null) "" else value).map { d =>
      if (d.isWhole) d else math.rint(d * 100) / 100
    }

  /** reference reid/func.py:266-269 */
  def priceRequestToZero(value: String): Option[String] =
    Option(value).map(v =>
      if (v.toLowerCase.contains("price request")) "0" else v)

  // ------------------------------------------------------------------ sizes

  /** reference reid/func.py:450-476: first pattern whose named group parses
    * wins; comma→dot first, comma-stripped on failure; trailing "are" in
    * the full match means ares → ×100 sqm.
    */
  def findSize(text: String, patterns: Seq[Pattern], group: Int): Option[Double] = {
    if (text == null) return None
    val pAreEnd = re("are$")
    patterns.iterator.flatMap { p =>
      val m = p.matcher(text)
      if (m.find() && m.group(group) != null) {
        val whole = m.group()
        val raw = m.group(group)
        val parsed = toDoubleOpt(raw.replace(",", "."))
          .orElse(toDoubleOpt(raw.replace(",", "")))
        parsed.flatMap { v =>
          if (!hasDigit.matcher(raw).find()) None
          else if (pAreEnd.matcher(whole).find()) Some(v * 100)
          else Some(v)
        }
      } else None
    }.take(1).toList.headOption
  }

  private val landPatterns = Seq(
    re("(land size|luas tanah|land area|total area).*?([0-9.,]+)\\s*(m2|sqm|sq\\. meter|square meter|are)"),
    re("([0-9.,]+)\\s*(sqm of land|square meter(s)? of land|sqm|are)"))

  /** reference reid/func.py:479-487 (patterns are applied to lowercased
    * text; group index = the size group in each pattern).
    */
  def findLandSize(desc: String): Option[Double] =
    if (desc == null) None
    else {
      val d = desc.toLowerCase
      findSize(d, Seq(landPatterns(0)), 2).orElse(findSize(d, Seq(landPatterns(1)), 1))
    }

  private val buildPatterns: Seq[(Pattern, Int)] = Seq(
    (re("build(ing)? size.*?([0-9.,]+)\\s*(m2|m²|sqm|are)?"), 2),
    (re("build(ing)?\\s*([0-9.,]+)\\s*(m2|m²|sqm|are)?"), 2),
    (re("([0-9.,]+)\\s*(sqm built area|square meter(s)? build|sqm|are)"), 1),
    (re("([0-9.,]+) sqm building size"), 1))

  /** reference reid/func.py:490-496 */
  def findBuildSize(desc: String): Option[Double] =
    if (desc == null) None
    else {
      val d = desc.toLowerCase
      buildPatterns.iterator
        .flatMap { case (p, g) => findSize(d, Seq(p), g) }
        .take(1).toList.headOption
    }

  /** reference reid/func.py:767-786: line-scoped extraction — only lines
    * passing the keyword predicate are scanned; a single match on a line
    * returns immediately, multiple matches accumulate and the max wins.
    */
  def extractor(p: Pattern, text: String, linePred: String => Boolean): Option[Double] = {
    if (text == null) return None
    var results = Vector.empty[Double]
    for (line <- text.split("\n", -1)) {
      if (linePred(line)) {
        val found = findAllGroup(p, line, 1).flatMap(toNumber)
        if (found.size == 1) return Some(found.head)
        else if (found.nonEmpty) results ++= found
      }
    }
    if (results.nonEmpty) Some(results.max) else None
  }

  private val pSizeUnit = re("\\b([0-9.,]+)(\\s*)(sqm|m2|are)\\b")

  /** reference reid/func.py:789-796 */
  def landsizeExtractor(text: String): Option[Double] =
    extractor(pSizeUnit, text, l => {
      val s = l.toLowerCase
      s.contains("landsize") || s.contains("land size") || s.contains("land for sale")
    })

  private val pBuildLine = re("(?:[Vv]illa|[Bb]uilding)(.*?)([0-9.,]+)(sqm|m2|are)")

  /** reference reid/func.py:799-805: anchored at line start (re.match). */
  def buildsizeExtractor(text: String): Option[Double] = {
    if (text == null) return None
    for (line <- text.split("\n", -1)) {
      val m = pBuildLine.matcher(line)
      if (m.lookingAt()) return toNumber(m.group(2))
    }
    None
  }

  /** reference reid/func.py:936-939: returns the raw captured string. */
  def cariLuasTanah(text: String): Option[String] =
    if (text == null) None
    else findGroup(reCI(
      "(land size|luas tanah|land area|total area).*?([0-9.,]+)\\s*(m2|sqm|sq\\. meter|square meter|are)"),
      text, 2)

  /** reference reid/func.py:803-825: only the "/are" form recalculates
    * (the /m2 branch is commented out in the reference).
    */
  def recalculatePriceByLandSize(text: String, price: Long, landSize: Long): Option[Double] = {
    if (text == null) return None
    val per = findAll(re("/\\w+"), text).distinct.mkString(" ")
    if ((per.contains("are") || per.contains("m2")) && per.contains("are") && landSize > 0)
      Some(price * (landSize.toDouble / 100))
    else None
  }

  // -------------------------------------------------------- leasehold years

  /** reference reid/func.py:396-404 */
  def findLeaseholdYearsBahasa(text: String): Option[Int] = {
    if (text == null) return None
    val t = text.replaceAll("\n", " ")
    findGroup(reCI("harga(.*?)\\d{1,2}(.*?)(utk|untuk)(.*?)(\\d{1,2})\\s*tahun"), t, 5)
      .flatMap(s => toDoubleOpt(s).map(_.toInt))
  }

  private def sentencesOf(text: String): Vector[String] =
    text.toLowerCase.split("\n", -1).toVector.flatMap(_.split("\\.", -1))

  /** reference reid/func.py:407-447: per sentence containing year/lease,
    * strip separators out of number runs, 4-digit years starting "2" become
    * (year - asOfYear), bare 1-2 digit numbers count when "year" present;
    * overall max wins.
    */
  def countLeaseYears(text: String, asOfYear: Int): Option[Int] = {
    if (text == null) return None
    def purify(s: String): String = {
      var out = s
      for (run <- findAll(re("[0-9,.]+"), s))
        out = out.replace(run, run.replace(",", "").replace(".", ""))
      out
    }
    var years = Vector.empty[Int]
    for (stc <- sentencesOf(text)) {
      if (stc.contains("year") || stc.contains("lease")) {
        val p = purify(stc)
        years ++= findAll(re("\\b\\d{4}\\b"), p)
          .filter(_.startsWith("2")).map(_.toInt - asOfYear)
        if (stc.contains("year"))
          years ++= findAll(re("\\b\\d{1,2}\\b"), p).map(_.toInt)
      }
    }
    if (years.nonEmpty) Some(years.max) else None
  }

  /** reference reid/func.py:499-557: date-stripped sentence scan, candidate
    * cascade sorted by digit length; 4-digit years >= asOfYear become
    * remaining years, 2-digit values are taken verbatim.
    */
  def findLeaseYears(description: String, asOfYear: Int): Option[Int] = {
    if (description == null) return None
    val pYears = re("\\d{2}\\s?th|\\d{1,2}\\s?year|\\b\\d{2}\\b|\\b\\d{4}\\b")
    val pDate = re("\\d+/\\d+/\\d+")
    val pMonthDay = re("\\d{2}/\\d{2}/")
    val pPriceYear = re("price(.*?)(20\\d{2}$)")
    def reNumber(v: String): String =
      findFirst(digitRun, v.replace(",", ".")).getOrElse("00")
    def valid(v: String): Boolean =
      (v.length == 2 && !v.startsWith("0")) || (v.length == 4 && v.startsWith("2"))
    for (s0 <- sentencesOf(description)) {
      if (s0.contains("years") || s0.contains("lease") || pPriceYear.matcher(s0).find()) {
        var s = s0
        for (d <- findAll(pDate, s0); md <- findAll(pMonthDay, d))
          s = s.replace(md, "")
        val candidates = findAll(pYears, s)
          .map(reNumber).filter(valid)
          .flatMap(toNumber).map(pyNumStr)
          .filter(v => v.length == 2 || v.length == 4)
          .sortBy(_.length)
        if (candidates.nonEmpty) {
          val d = candidates.head
          if (d.length == 4 && d.toInt >= asOfYear) return Some(d.toInt - asOfYear)
          else if (d.length == 2) return Some(d.toInt)
          // otherwise keep scanning further sentences (reference falls through)
        }
      }
    }
    None
  }

  /** reference reid/func.py:560-583, incl. the "rajavilla" min() fallback
    * (second element = true when the value is integral, mirroring the
    * reference's int-vs-float distinction that FindLeaseYears checks).
    */
  def getLeaseYears(text: String, asOfYear: Int): Option[(Double, Boolean)] = {
    if (text == null) return None
    val t = text.toLowerCase
    if (!(t.contains("year") || t.contains("lease") || re("\\d{4}").matcher(t).find()))
      return None
    val years = findAll(re("\\b\\d{4}\\b|\\d{2} years|\\d{2} year"), t)
      .flatMap(m => findFirst(re("\\d{2,4}"), m))
      .filter(v => v.length == 2 || v.length == 4)
      .sortBy(_.length).map(_.toInt)
    if (years.nonEmpty) {
      val y = years.head
      // the reference re-checks str(int(v)): a zero-padded "05" became 5,
      // whose length is 1 → neither branch fires → None (no fallback)
      if (y.toString.length == 4) Some(((y - asOfYear).toDouble, true))
      else if (y.toString.length == 2) Some((y.toDouble, true))
      else None
    } else if (t.contains("year")) {
      val results = findAll(pNum, t)
        .filter(v => hasDigit.matcher(v).find())
        .map(v => if (v.contains(",")) v.replace(",", ".") else v)
        .flatMap(toNumberTyped)
      if (results.nonEmpty) Some(results.minBy(_._1)) else None
    } else None
  }

  /** reference reid/func.py:586-624: lease-anchored patterns per line,
    * order-preserving dedup; returns ALL candidate years.
    */
  def searchLeaseholdYears(description: String, asOfYear: Int): Vector[Int] = {
    if (description == null) return Vector.empty
    val patterns = Seq(
      re("lease(hold)?.*?(\\d{2,4})\\s*"),
      re("lease(hold)?.*?(\\d{2})\\s+year"),
      re("(\\s*)(\\d{2,4})\\s+year.*?lease"))
    def valid(v: String): Boolean = {
      val digit = v.length
      val prime = v.charAt(0) - '0'
      if (digit < 4) digit > 1 && prime > 0 && v.toInt <= 100
      else digit > 1 && prime > 0
    }
    var results = Vector.empty[String]
    for (line <- description.toLowerCase.split("\n", -1)
           if line.contains("year") || line.contains("lease");
         p <- patterns;
         r <- findAllGroup(p, line, 2).filter(valid))
      if (!results.contains(r)) results :+= r
    results.map(v => if (v.length == 4) v.toInt - asOfYear else v.toInt)
  }

  /** reference reid/customs/dotproperty.py:22-49: 4-digit-or-"NNth" scan,
    * century filter, first positive delta.
    */
  def findYears(value: String, asOfYear: Int): Option[Int] = {
    if (value == null) return None
    val years0 = findAll(re("\\d{4}|\\d{2}\\s*th"), value)
      .filter(_.trim.nonEmpty)
      .flatMap(toNumber)
    val years1 = years0.filter(y =>
      if (pyNumStr(y).length == 4) pyNumStr(y).startsWith("2") else true)
    if (years1.isEmpty) return None
    val deltas = years1.map(y =>
      if (pyNumStr(y).length == 4) y - asOfYear else y)
    deltas.find(_ > 0).map(_.toInt)
  }

  /** reference reid/customs/dotproperty.py:52-67: first strategy with a
    * truthy result wins (note Python `or`: a 0 result falls through).
    */
  def leaseholdYearsFinders(text: String, asOfYear: Int): Option[Int] = {
    if (text == null || text.isEmpty) return None
    findLeaseYears(text, asOfYear).filter(_ != 0)
      .orElse(findYears(text, asOfYear).filter(_ != 0))
      .orElse(countLeaseYears(text, asOfYear).filter(_ != 0))
      .orElse(findLeaseholdYearsBahasa(text).filter(_ != 0))
  }

  /** reference reid/customs/ubudproperty.py:25-41: "[0-9.]+ year" or bare
    * 4-digit; years-deltas abs()'d; max wins. (The reference pins "2023"
    * via a > 2023 literal and CURRENT_YEAR at import; both take asOfYear.)
    */
  def ubudFindLeaseholdYears(text: String, asOfYear: Int): Option[Double] = {
    if (text == null) return None
    val results = findAll(re("[0-9.]+ [Yy]ear|\\d{4}"), text)
      .map(_.toLowerCase)
      .filter(x => x.contains("year") || (toDoubleOpt(x).exists(_ > 2023)))
      .map(x =>
        if (!x.contains("year")) math.abs(x.toInt - asOfYear).toDouble
        else x.replaceAll("[ year]+$", "").toDouble)
    if (results.isEmpty) None else Some(results.max)
  }

  /** reference reid/func.py:676-681: first candidate whose getLeaseYears
    * result is an int.
    */
  def findLeaseYearsProcessor(values: Seq[String], asOfYear: Int): Option[Int] =
    values.iterator
      .flatMap(v => getLeaseYears(v, asOfYear))
      .collectFirst { case (d, true) => d.toInt }

  // ------------------------------------------------------------------ dates

  private val mmddyy = DateTimeFormatter.ofPattern("MM/dd/yy")

  /** reference reid/func.py:224-252: three date shapes inside image URLs,
    * month>12 means month/day were swapped; first valid date wins,
    * formatted MM/dd/yy.
    */
  def getUploadedDate(src: String): Option[String] = {
    if (src == null) return None
    val patterns = Seq(
      re("(\\d{4})-(\\d{2})-(\\d{2})"),
      re("(\\d{4})(\\d{2})(\\d{2})"),
      re("(\\d{4})/(\\d{2})/"))
    for ((p, i) <- patterns.zipWithIndex) {
      val m = p.matcher(src)
      if (m.find()) {
        val year = m.group(1)
        if (re("^20\\d{2}$").matcher(year).matches()) {
          var month = m.group(2)
          var day = if (i == 2) "01" else m.group(3)
          if (month.toInt > 12) { val t = month; month = day; day = t }
          try {
            val d = LocalDate.of(year.toInt, month.toInt, day.toInt)
            return Some(d.format(mmddyy))
          } catch { case _: Exception => /* next pattern */ }
        }
      }
    }
    None
  }

  /** reference reid/func.py:272-285: "3 months ago" → asOf - 90 days.
    * Unrecognized units pass the original text through (reference behavior).
    */
  def timeAgoToDatetime(text: String, asOf: LocalDate): Option[String] = {
    if (text == null) return None
    toNumber(text) match {
      case None => Some(text)
      case Some(n) =>
        val days: Option[Double] =
          if (text.contains("year")) Some(n * 365)
          else if (text.contains("month")) Some(n * 30)
          else if (text.contains("week")) Some(n * 7)
          else if (text.contains("day")) Some(n)
          else None
        days match {
          case Some(d) => Some(asOf.minusDays(math.ceil(d).toLong).format(mmddyy))
          case None => Some(text)
        }
    }
  }

  /** reference reid/func.py:643-648. Python fromisoformat accepts values
    * with or without an offset (and bare dates) — try each shape; an
    * unparseable capture yields "" instead of the reference's crash.
    */
  def findPublishedDate(script: String): Option[String] = {
    if (script == null) return Some("")
    findGroup(re("\"datePublished\":\"([T0-9\\-:+]+)\""), script, 1).flatMap { iso =>
      val parsed: Option[LocalDate] =
        (try Some(java.time.OffsetDateTime.parse(iso).toLocalDate)
         catch { case _: Exception => None })
          .orElse(try Some(java.time.LocalDateTime.parse(iso).toLocalDate)
                  catch { case _: Exception => None })
          .orElse(try Some(LocalDate.parse(iso))
                  catch { case _: Exception => None })
      parsed.map(_.format(mmddyy))
    }.orElse(Some(""))
  }

  /** reference reid/func.py:884-889, parameterized on asOf (the reference
    * crashes every January — date.replace(month=0); we use real month math).
    */
  def firstMonth(asOf: LocalDate): String =
    asOf.withDayOfMonth(1).minusMonths(1).format(DateTimeFormatter.ISO_LOCAL_DATE)

  /** reference reid/customs/balipropertiesforsale.py:1-6 */
  def toMmddyy(s: String): Option[String] =
    try Some(java.time.LocalDateTime
      .parse(s, DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      .toLocalDate.format(mmddyy))
    catch { case _: Exception => None }

  /** reference reid/customs/ubudproperty.py:14-22 */
  def extractPublishDate(text: String): Option[LocalDate] =
    if (text == null) None
    else findFirst(re("\\d{8}"), text).flatMap { s =>
      try Some(LocalDate.parse(s, DateTimeFormatter.ofPattern("yyyyMMdd")))
      catch { case _: Exception => None }
    }

  // ----------------------------------------------------------- categoricals

  /** reference reid/func.py:849-867: regex ladder, first hit wins, then
    * " for Sale" is stripped from whatever survives.
    */
  def standardizePropertyType(propertyType: String): String = {
    if (propertyType == null) return null
    val t =
      if (reCI("land").matcher(propertyType).find()) "Land"
      else if (reCI("townhouse").matcher(propertyType).find()) "Townhouse"
      else if (reCI("house|home").matcher(propertyType).find()) "House"
      else if (reCI("apartment|apartement").matcher(propertyType).find()) "Apartment"
      else if (reCI("commercial").matcher(propertyType).find()) "Commercial"
      else if (reCI("^hotel").matcher(propertyType).find()) "Hotel"
      else if (reCI("villa").matcher(propertyType).find()) "Villa"
      else propertyType
    t.replace(" for Sale", "")
  }

  private val defineTypes = Seq(
    "apartment" -> "Apartment", "apartement" -> "Apartement",
    "townhotel" -> "Townhotel", "hotel" -> "Hotel", "land" -> "Land",
    "loft" -> "Loft", "plot" -> "Land", "house|home" -> "House",
    "villa" -> "Villa")

  /** reference reid/func.py:651-673: keyword search with default "Villa";
    * plot→Land, home/house→House.
    */
  def definePropertyType(text: String, default: String = "Villa"): String = {
    if (text == null) return default
    for ((pat, label) <- defineTypes) {
      val m = reCI(pat).matcher(text)
      if (m.find()) {
        val word = m.group().toLowerCase
        return if (word.contains("home") || word.contains("house")) "House"
        else if (word.contains("plot")) "Land"
        else label
      }
    }
    default
  }

  /** reference reid/func.py:161-165 */
  def findPropertyType(text: String): Option[String] = {
    if (text == null) return None
    val types = Seq("villa", "apartement", "townhotel", "land", "loft", "house", "home")
    val t = text.toLowerCase
    types.find(t.contains).map(_.capitalize)
  }

  /** reference reid/func.py:372-377: matched value Title-cased, otherwise
    * the original passes through.
    */
  def findContractType(value: String): String =
    if (value == null) null
    else findFirst(re("leasehold|freehold"), value.toLowerCase)
      .map(_.capitalize).getOrElse(value)

  /** reference reid/func.py:380-383: default "Freehold". */
  def getContractType(value: String): String =
    if (value == null) "Freehold"
    else findFirst(re("leasehold|freehold"), value.toLowerCase)
      .map(_.capitalize).getOrElse("Freehold")

  /** reference reid/customs/exotiqproperty.py:1-6 */
  def leaseOrFreeHold(value: String): String = value match {
    case "For lease" => "Leasehold"
    case "For sale" => "Freehold"
    case v => v
  }

  /** reference reid/func.py:187-194 → (is_leasehold, is_sold) */
  def findHoldState(tags: Seq[String]): (Boolean, Boolean) = {
    val cleaned = tags.map(t => t.replaceAll("\\s+", "").toLowerCase.trim)
    (cleaned.exists(_.contains("lease")), cleaned.exists(_.contains("sold")))
  }

  // ----------------------------------------------------- availability flags

  /** reference reid/func.py:684-693 */
  def anySoldDelisted(values: Seq[String]): String =
    if (values.exists(_.toLowerCase.contains("sold"))) "Sold"
    else if (values.exists(_.toLowerCase.contains("delisted"))) "Delisted"
    else "Available"

  /** reference reid/func.py:736-742 */
  def findSoldOut(labels: Seq[String]): String =
    if (labels.nonEmpty && labels.exists(_.toLowerCase.contains("sold"))) "Sold"
    else "Available"

  /** reference reid/func.py:296-299 */
  def isSold(value: String): String =
    if (value != null && value.toLowerCase == "sold") "Sold" else "Available"

  private val offPlanForms = Seq("off plan", "offplan", "off-plan")

  /** reference reid/func.py:745-757 */
  def findOffPlan(title: String, description: String,
                  labels: Seq[String] = Seq.empty): Boolean = {
    def has(s: String): Boolean =
      s != null && offPlanForms.exists(s.trim.toLowerCase.contains)
    has(title) || has(description) || labels.exists(has)
  }

  // --------------------------------------------------------------- bedrooms

  /** reference reid/func.py:760-764 */
  def findBedrooms(text: String): Option[Int] =
    if (text == null) None
    else findGroup(reCI("(\\d{1,2}) bedroom(s?)"), text, 1).map(_.toInt)

  /** reference reid/func.py:870-882: number nearest to the word "bedroom"
    * wins. The outer containment check is case-sensitive like the reference.
    */
  def findBedroomsInDescription(text: String): Option[Int] = {
    if (text == null || !text.contains("bedroom")) return None
    findFirst(reCI("\\b\\d{1,2}.*?bedroom"), text).flatMap { sub =>
      val numbers = findAll(re("\\d{1,2}"), sub)
      val mBed = re("bedroom").matcher(sub)
      if (!mBed.find() || numbers.isEmpty) None
      else {
        val n = mBed.start()
        val dists = numbers.map { num =>
          val m = re("(" + num + ").*?bedroom").matcher(sub)
          if (m.find()) n - m.start() else Int.MaxValue
        }
        Some(numbers(dists.indexOf(dists.min)).toInt)
      }
    }
  }

  // ------------------------------------------------------------ string/misc

  /** reference reid/func.py:35-37 (faithful: the mandatory [s] means plain
    * http:// URLs do NOT match, as in the reference).
    */
  def getDomain(url: String): Option[String] =
    if (url == null) None
    else findGroup(re("http[s]://(.*?)/"), url, 1)

  /** reference reid/func.py:262-263 */
  def removeWhitespace(value: String): String =
    if (value == null) null else value.replaceAll("\\s+", " ").trim

  /** reference reid/func.py:347-351 */
  def constructDescription(rows: Seq[String]): String =
    rows.map(_.trim).filter(_.nonEmpty).mkString("\n").trim

  /** reference reid/func.py:288-289 */
  def dotToComma(value: String): String =
    if (value == null) null else value.replace(".", ",")

  /** reference reid/func.py:292-293 */
  def removeShowMoreLess(value: String): String =
    if (value == null) null
    else value.replace("Show More", "").replace("Show Less", "")

  /** reference reid/func.py:197-206: first separator present wins, in
    * declaration order ("/", "-", "+", "or").
    */
  def grabFirst(value: String): String = {
    if (value == null) return null
    if (value.contains("/")) value.split("/", -1)(0)
    else if (value.contains("-")) value.split("-", -1)(0)
    else if (value.contains("+")) value.split("\\+", -1)(0)
    else if (value.contains("or")) value.split("or", -1)(0)
    else value
  }

  /** reference reid/func.py:209-212 */
  def grabFirstWord(text: String): Option[String] =
    if (text == null) None else findFirst(re("\\w+"), text)

  /** reference reid/func.py:11-12 */
  def getFirst(text: String, sep: String): String =
    String.valueOf(text).split(Pattern.quote(sep), -1).head
  def getLast(text: String, sep: String): String =
    String.valueOf(text).split(Pattern.quote(sep), -1).last

  /** reference reid/func.py:215-221: "k: v" lines → map. */
  def getIcons(icons: Seq[String]): Map[String, String] =
    icons.map { i =>
      val parts = i.split(":", -1)
      val k = parts.head.toLowerCase.trim.replace(" ", "_")
      val v = parts.last.toLowerCase.trim.replace("m2", "")
      k -> v
    }.toMap

  /** reference reid/func.py:182-184 */
  def getImgSrc(s: String): Option[String] =
    if (s == null) None else findGroup(re("\\((.*?)\\)"), s, 1)

  /** reference reid/func.py:255-259 */
  def getBackgroundImage(value: String): String =
    if (value == null) null
    else findGroup(re("background-image:url\\((.*)\\);"), value, 1).getOrElse(value)

  /** reference reid/func.py:627-640: strips "-WxH" suffixes for jpg/jpeg/
    * png — faithfully NOT webp (the reference loop stops at group 3).
    */
  def dimensionRemover(src: String): String = {
    if (src == null) return null
    val p = re("(-\\d+x\\d+)\\.jpg|(-\\d+x\\d+)\\.jpeg|(-\\d+x\\d+)\\.png|(-\\d+x\\d+)\\.webp")
    val m = p.matcher(src)
    var out = src
    if (m.find())
      for (i <- 1 to 3; dim = m.group(i) if dim != null)
        out = out.replace(dim, "")
    out
  }

  /** reference reid/func.py:354-362: span located in the lowercased text,
    * sliced from the original to restore case.
    */
  def findLocationInDescription(description: String): Option[String] = {
    if (description == null) return None
    val line = description.toLowerCase
    if (!line.contains("location")) return None
    findGroup(re("location:\\s*(\\w+)\\b"), line, 1).flatMap { loc =>
      val m = re(Pattern.quote(loc)).matcher(line)
      if (m.find()) Some(description.substring(m.start(), m.end())) else None
    }
  }

  /** reference reid/func.py:365-369 */
  def findLocationInTitle(title: String): Option[String] =
    if (title == null) None
    else findGroup(reCI("in (\\w+)"), title, 1).map(_.toLowerCase.capitalize)

  /** reference reid/func.py:385-393 */
  def grabPrice(price: String): (Option[String], Option[String]) = {
    if (price == null) return (None, None)
    val p = price.toLowerCase
    if (p.contains("idr")) (Some(p), None)
    else if (p.contains("usd")) (None, Some(p))
    else (None, None)
  }

  /** reference reid/func.py:892-916: group(1) is word-bounded IDR; any
    * other alternative returns the whole matched text; no match passes the
    * input through.
    */
  def extractCurrency(text: String): String = {
    if (text == null) return null
    val p = reCI("\\b(IDR)\\b|\\b(USD)\\b|\\b(Rp)\\b|(IDR)\\d+|(USD)\\d+|\\b(Rp)\\s*\\d+")
    val m = p.matcher(text)
    if (m.find()) { if (m.group(1) != null) m.group(1) else m.group() }
    else text
  }

  /** reference reid/func.py:919-925 */
  def identifyCurrency(text: String): Option[String] = {
    if (text == null) return None
    if (reCI("\\bIDR\\b|\\bRp\\b|\\bIDR\\d+").matcher(text).find()) Some("IDR")
    else if (reCI("\\bUSD\\b|\\bUSD\\d+").matcher(text).find()) Some("USD")
    else None
  }

  /** reference reid/customs/dotproperty.py:11-19 */
  def afterColon(text: String): String = {
    if (text == null) return ""
    val results = text.split(":", -1)
    if (results.length > 1) results.last.trim
    else results.head
  }

  /** reference reid/customs/balimoves.py:1-4: Python lstrip("fa-") strips
    * the CHARACTER SET {f, a, -} from the left, not the literal prefix —
    * "fa-arrows" → "rrows".
    */
  def faRemover(faClass: String): Option[String] =
    if (faClass == null || faClass.isEmpty) None
    else Some(faClass.split(" ", -1).last.replaceFirst("^[fa-]+", ""))

  /** reference reid/customs/balitreasureproperties.py:4-9 */
  def findPageNumber(url: String): Int =
    findGroup(re("cpage=(\\d+)"), String.valueOf(url), 1).map(_.toInt).getOrElse(0)

  /** reference reid/customs/ubudproperty.py:7-11 */
  def findCode(text: String): String =
    if (text == null) "" else findGroup(re("(.*?) \\("), text, 1).getOrElse("")

  /** reference reid/customs/balivillasales.py:1-22: "IDR 2.5m / 25 years"
    * compound field → (idr, usd, leaseYears, availability).
    */
  def baliVillaSalesPrice(text: String)
      : (Option[String], Option[String], Option[String], String) = {
    if (text == null) return (None, None, None, "Available")
    val p = text.trim.toLowerCase.split("/", -1)
    val leaseYears = if (p.length > 1) Some(p.last) else None
    val head = p.head
    val idr = if (head.contains("idr")) Some(head) else None
    val usd = if (idr.isEmpty && head.contains("usd")) Some(head) else None
    val availability = if (head.contains("sold")) "Sold" else "Available"
    (idr, usd, leaseYears, availability)
  }

  /** reference reid/func.py:828-837 / :947-950 */
  def finder(pattern: String, text: String, group: Int = 0): Option[String] =
    if (text == null) None else findGroup(re(pattern), text, group)
}
