package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression versions of the scalar library (SURVEY §2.7) for
  * everything expressible with built-in, codegen'd functions — regexp
  * chains, when-ladders, date arithmetic, array ops. The irreducible
  * multi-strategy parsers live in [[Udfs]]; everything here stays inside
  * whole-stage codegen (no UDF fences in the hot path).
  *
  * Fidelity contract: each function mirrors the same-named Parse kernel
  * function; CleanersSpec cross-checks Column output against the kernel on
  * the reference-derived fixtures.
  */
object Cleaners {

  private def nullIfEmpty(c: Column): Column = nullif(c, lit(""))

  /** reference reid/func.py:64-96 — the ordered substitution chain as
    * nested regexp_replace (all codegen'd).
    */
  def cleanPriceText(c: Column): Column = {
    var v = lower(c)
    def sub(p: String, r: String): Unit = { v = regexp_replace(v, p, r) }
    sub("/", " per ")
    sub("\\s+", " ")
    sub("per$|-$", "")
    sub("^rp\\.?", "")
    sub("rupia$|rupiah|bersih", "")
    sub("\\.00$", "\\\\,00") // literal backslash, as the reference emits
    sub("m2", "meter")
    sub("per m$", "permeter")
    sub("per(.*?)meter", "permeter")
    sub("juta(.*?)per(.*?)meter", "juta permeter")
    sub("jjuta", "juta")
    sub("mete$|meteer", "meter")
    sub("per\\s*tahun", "pertahun")
    sub("pertahun", "")
    sub("nego|neg$", "")
    sub("_|\\)|\\(", "")
    trim(element_at(split(v, "-", -1), 1))
  }

  /** reference reid/func.py:115-122 */
  def checkPerMeter(c: Column): Column =
    cleanPriceText(c).rlike("per(.*?)meter")

  /** reference reid/func.py:53-61: IDR amount, both separators stripped. */
  def findIdr(c: Column): Column =
    nullIfEmpty(translate(
      regexp_extract(c, "(?i)IDR\\s*([0-9.,]+)", 1), ".,", ""))
      .cast("bigint")

  /** reference reid/func.py:40-50: USD amount — integer as-is, otherwise
    * dots stripped (thousands separators).
    */
  def findUsd(c: Column): Column = {
    val g = nullIfEmpty(regexp_extract(c, "(?i)USD\\s*([0-9.,]+)", 1))
    val noComma = translate(g, ",", "")
    when(noComma.rlike("^\\d+$"), noComma)
      .otherwise(nullIfEmpty(translate(noComma, ".", "")))
      .cast("bigint")
  }

  /** reference reid/func.py:322-344: "5.5 are" → 550; non-are input passes
    * through as null (caller coalesces with the original).
    */
  def areToSqm(c: Column): Column = {
    val g = nullIfEmpty(regexp_extract(c, "(?i)([0-9.,]+)\\s*are", 1))
    (regexp_replace(g, ",", ".").cast("double") * 100).cast("bigint")
  }

  /** reference reid/func.py:266-269 */
  def priceRequestToZero(c: Column): Column =
    when(lower(c).contains("price request"), lit("0")).otherwise(c)

  /** reference reid/func.py:302-319: whole numbers stay whole, fractions
    * round to 2 decimals — Python round() is half-even, so bround, not
    * round (HALF_UP would diverge on exact .xx5 values).
    */
  def safeNumber(c: Column): Column = bround(c.cast("double"), 2)

  /** reference reid/func.py:892-916. The reference returns group(1) when
    * the word-bounded IDR alternative won, otherwise the whole match — but
    * for that alternative group(1) IS the whole match, so the leftmost
    * full match is always the answer (a separate IDR probe would wrongly
    * prefer a later IDR over an earlier USD in mixed-currency text).
    */
  def extractCurrency(c: Column): Column = {
    val m = regexp_extract(c,
      "(?i)\\b(IDR)\\b|\\b(USD)\\b|\\b(Rp)\\b|(IDR)\\d+|(USD)\\d+|\\b(Rp)\\s*\\d+", 0)
    coalesce(nullIfEmpty(m), c)
  }

  /** reference reid/func.py:919-925 */
  def identifyCurrency(c: Column): Column =
    when(c.rlike("(?i)\\bIDR\\b|\\bRp\\b|\\bIDR\\d+"), "IDR")
      .when(c.rlike("(?i)\\bUSD\\b|\\bUSD\\d+"), "USD")

  /** reference reid/func.py:849-867 */
  def standardizePropertyType(c: Column): Column = {
    val t = when(c.rlike("(?i)land"), "Land")
      .when(c.rlike("(?i)townhouse"), "Townhouse")
      .when(c.rlike("(?i)house|home"), "House")
      .when(c.rlike("(?i)apartment|apartement"), "Apartment")
      .when(c.rlike("(?i)commercial"), "Commercial")
      .when(c.rlike("(?i)^hotel"), "Hotel")
      .when(c.rlike("(?i)villa"), "Villa")
      .otherwise(c)
    regexp_replace(t, " for Sale", "")
  }

  /** reference reid/func.py:651-673: ordered keyword scan, default Villa;
    * matched home/house→House, plot→Land.
    */
  def definePropertyType(c: Column, default: String = "Villa"): Column =
    when(c.rlike("(?i)apartment"), "Apartment")
      .when(c.rlike("(?i)apartement"), "Apartement")
      .when(c.rlike("(?i)townhotel"), "Townhotel")
      .when(c.rlike("(?i)hotel"), "Hotel")
      .when(c.rlike("(?i)land"), "Land")
      .when(c.rlike("(?i)loft"), "Loft")
      .when(c.rlike("(?i)plot"), "Land")
      .when(c.rlike("(?i)house|home"), "House")
      .when(c.rlike("(?i)villa"), "Villa")
      .otherwise(default)

  /** reference reid/func.py:161-165 (substring scan, lowercased input,
    * Title-cased output; "home" is its own label).
    */
  def findPropertyType(c: Column): Column = {
    val t = lower(c)
    when(t.contains("villa"), "Villa")
      .when(t.contains("apartement"), "Apartement")
      .when(t.contains("townhotel"), "Townhotel")
      .when(t.contains("land"), "Land")
      .when(t.contains("loft"), "Loft")
      .when(t.contains("house"), "House")
      .when(t.contains("home"), "Home")
  }

  /** reference reid/func.py:372-377 */
  def findContractType(c: Column): Column =
    coalesce(initcap(nullIfEmpty(regexp_extract(lower(c), "leasehold|freehold", 0))), c)

  /** reference reid/func.py:380-383 */
  def getContractType(c: Column): Column =
    coalesce(initcap(nullIfEmpty(regexp_extract(lower(c), "leasehold|freehold", 0))),
      lit("Freehold"))

  /** reference reid/customs/exotiqproperty.py:1-6 */
  def leaseOrFreeHold(c: Column): Column =
    when(c === "For lease", "Leasehold")
      .when(c === "For sale", "Freehold")
      .otherwise(c)

  /** reference reid/func.py:684-693 over an array column */
  def anySoldDelisted(values: Column): Column =
    when(exists(values, v => lower(v).contains("sold")), "Sold")
      .when(exists(values, v => lower(v).contains("delisted")), "Delisted")
      .otherwise("Available")

  /** reference reid/func.py:736-742 */
  def findSoldOut(labels: Column): Column =
    when(exists(labels, v => lower(v).contains("sold")), "Sold")
      .otherwise("Available")

  /** reference reid/func.py:296-299 */
  def isSold(c: Column): Column =
    when(lower(c) === "sold", "Sold").otherwise("Available")

  /** reference reid/func.py:745-757 / models/property.py:61-68 */
  def findOffPlan(title: Column, description: Column, labels: Column): Column = {
    def has(c: Column): Column =
      coalesce(lower(trim(c)).rlike("off plan|offplan|off-plan"), lit(false))
    has(title) || has(description) ||
      coalesce(exists(labels, has), lit(false))
  }

  /** reference reid/func.py:187-194 → struct(is_leasehold, is_sold) */
  def findHoldState(tags: Column): Column = {
    val cleaned = transform(tags, t => lower(regexp_replace(t, "\\s+", "")))
    struct(
      exists(cleaned, _.contains("lease")).as("is_leasehold"),
      exists(cleaned, _.contains("sold")).as("is_sold"))
  }

  /** reference reid/func.py:760-764 */
  def findBedrooms(c: Column): Column =
    nullIfEmpty(regexp_extract(c, "(?i)(\\d{1,2}) bedroom(s?)", 1)).cast("int")

  /** reference reid/func.py:396-404 */
  def findLeaseholdYearsBahasa(c: Column): Column =
    nullIfEmpty(regexp_extract(regexp_replace(c, "\n", " "),
      "(?i)harga(.*?)\\d{1,2}(.*?)(utk|untuk)(.*?)(\\d{1,2})\\s*tahun", 5)).cast("int")

  /** reference reid/func.py:35-37 (https-only, as the reference) */
  def getDomain(c: Column): Column =
    nullIfEmpty(regexp_extract(c, "http[s]://(.*?)/", 1))

  /** reference reid/func.py:262-263 */
  def removeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** reference reid/func.py:347-351 over array column */
  def constructDescription(rows: Column): Column =
    trim(array_join(filter(transform(rows, trim(_)), _ =!= ""), "\n"))

  /** reference reid/func.py:288-293 */
  def dotToComma(c: Column): Column = translate(c, ".", ",")
  def removeShowMoreLess(c: Column): Column =
    regexp_replace(regexp_replace(c, "Show More", ""), "Show Less", "")

  /** reference reid/func.py:197-206: first separator present wins. */
  def grabFirst(c: Column): Column =
    when(c.contains("/"), element_at(split(c, "/", -1), 1))
      .when(c.contains("-"), element_at(split(c, "-", -1), 1))
      .when(c.contains("+"), element_at(split(c, "\\+", -1), 1))
      .when(c.contains("or"), element_at(split(c, "or", -1), 1))
      .otherwise(c)

  /** reference reid/func.py:209-212 */
  def grabFirstWord(c: Column): Column =
    nullIfEmpty(regexp_extract(c, "\\w+", 0))

  /** reference reid/func.py:11-12 */
  def getFirst(c: Column, sep: String): Column =
    element_at(split(c, java.util.regex.Pattern.quote(sep), -1), 1)
  def getLast(c: Column, sep: String): Column =
    element_at(split(c, java.util.regex.Pattern.quote(sep), -1), -1)

  /** reference reid/func.py:182-184 */
  def getImgSrc(c: Column): Column =
    nullIfEmpty(regexp_extract(c, "\\((.*?)\\)", 1))

  /** reference reid/func.py:255-259 */
  def getBackgroundImage(c: Column): Column =
    coalesce(nullIfEmpty(regexp_extract(c, "background-image:url\\((.*)\\);", 1)), c)

  /** reference reid/func.py:627-640: the FIRST match (webp included)
    * decides; only its jpg/jpeg/png groups are removed — everywhere that
    * exact dim substring occurs. A webp first match removes nothing.
    */
  def dimensionRemover(c: Column): Column = {
    val p = "(-\\d+x\\d+)\\.jpg|(-\\d+x\\d+)\\.jpeg|(-\\d+x\\d+)\\.png|(-\\d+x\\d+)\\.webp"
    val dim = coalesce(nullIfEmpty(regexp_extract(c, p, 1)),
      nullIfEmpty(regexp_extract(c, p, 2)),
      nullIfEmpty(regexp_extract(c, p, 3)))
    when(dim.isNotNull, replace(c, dim, lit(""))).otherwise(c)
  }

  /** reference reid/func.py:215-221: "k: v" lines → map. Python dict
    * update keeps the LAST value per key; map_from_entries throws on
    * duplicates, so entries whose key reappears later are dropped first.
    */
  def getIcons(icons: Column): Column = {
    val entries = transform(icons, i => struct(
      regexp_replace(lower(trim(element_at(split(i, ":", -1), 1))), " ", "_").as("key"),
      regexp_replace(lower(trim(element_at(split(i, ":", -1), -1))), "m2", "").as("value")))
    val lastWins = filter(entries, (e, i) =>
      !exists(slice(entries, i + 2, size(entries)),
        e2 => e2.getField("key") === e.getField("key")))
    map_from_entries(lastWins)
  }

  /** reference reid/func.py:365-369 */
  def findLocationInTitle(c: Column): Column =
    initcap(nullIfEmpty(regexp_extract(c, "(?i)in (\\w+)", 1)))

  /** reference reid/func.py:936-939 */
  def cariLuasTanah(c: Column): Column =
    nullIfEmpty(regexp_extract(c,
      "(?i)(land size|luas tanah|land area|total area).*?([0-9.,]+)\\s*(m2|sqm|sq\\. meter|square meter|are)", 2))

  /** reference reid/customs/dotproperty.py:11-19 */
  def afterColon(c: Column): Column =
    when(c.contains(":"), trim(element_at(split(c, ":", -1), -1))).otherwise(c)

  /** reference reid/customs/balimoves.py:1-4 (lstrip strips the char SET
    * {f, a, -}, not the literal prefix).
    */
  def faRemover(c: Column): Column =
    regexp_replace(element_at(split(c, " ", -1), -1), "^[fa-]+", "")

  /** reference reid/customs/balitreasureproperties.py:4-9 */
  def findPageNumber(c: Column): Column =
    coalesce(nullIfEmpty(regexp_extract(c, "cpage=(\\d+)", 1)).cast("int"), lit(0))

  /** reference reid/customs/ubudproperty.py:7-11 */
  def findCode(c: Column): Column =
    regexp_extract(c, "(.*?) \\(", 1)

  /** reference reid/func.py:643-648. The LITERAL local date is kept (like
    * Python fromisoformat) — to_timestamp would shift offset values to the
    * session zone and change the date.
    */
  def findPublishedDate(c: Column): Column = {
    val iso = regexp_extract(c, "\"datePublished\":\"([T0-9\\-:+]+)\"", 1)
    val y = nullIfEmpty(regexp_extract(iso, "^(\\d{4})-(\\d{2})-(\\d{2})", 1))
    val m = regexp_extract(iso, "^(\\d{4})-(\\d{2})-(\\d{2})", 2)
    val d = regexp_extract(iso, "^(\\d{4})-(\\d{2})-(\\d{2})", 3)
    coalesce(
      when(y.isNotNull, format_string("%s/%s/%s", m, d, substring(y, 3, 2))),
      lit(""))
  }

  /** reference reid/customs/ubudproperty.py:14-22 */
  def extractPublishDate(c: Column): Column =
    to_date(nullIfEmpty(regexp_extract(c, "\\d{8}", 0)), "yyyyMMdd")

  /** reference reid/customs/balipropertiesforsale.py:1-6 */
  def toMmddyy(c: Column): Column =
    date_format(to_timestamp(c, "yyyy-MM-dd HH:mm:ss"), "MM/dd/yy")

  /** reference reid/func.py:884-889, parameterized (SURVEY §7.4.4): first
    * day of the month before asOf, as yyyy-MM-dd.
    */
  def firstMonth(asOf: Column): Column =
    date_format(add_months(date_trunc("month", asOf), -1), "yyyy-MM-dd")

  /** ItemLoader `Max` output processor (reference reid/func.py:724-726):
    * max over candidate values — per-row array op, no window needed.
    */
  def maxProcessor(values: Column): Column = array_max(values)

  /** ItemLoader `TakeNth` (reference reid/func.py:702-721): trimmed nth
    * element, null past the end (element_at is 1-based; TakeNth is 0-based).
    */
  def takeNth(values: Column, n: Int): Column =
    try_element_at(transform(values, v => trim(v)), lit(n + 1))

  /** reference fill_missing_sold_at.py:8-27 imputation expression. */
  def imputeSoldAt(soldAt: Column, isAvailable: Column, updatedAt: Column): Column =
    when(!isAvailable && soldAt.isNull,
      add_months(date_trunc("month", updatedAt), -1))
      .otherwise(soldAt)
}
