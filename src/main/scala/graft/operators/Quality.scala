package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality rules → tags (SURVEY §2.8): the reference's 12-rule
  * `identify_issues` (models/property.py:70-138), off-plan detection
  * (models/property.py:61-68,140-153) and land-zoning classification
  * (models/property.py:155-194) as pure Column expressions — rule table →
  * array(when(...)) → filter → explode, no per-row session work.
  */
object Quality {

  /** The 12 issue rules in reference order (models/property.py:71-122).
    * Python truthiness: `not self.bedrooms` is true for null AND 0.
    */
  def issueRules: Seq[(String, DataFrame => Column)] = Seq(
    ("has_more_than_13_bedrooms",
      df => df("bedrooms").isNotNull && df("bedrooms") =!= 0 && df("bedrooms") >= 13),
    ("no_bedrooms",
      df => (df("bedrooms").isNull || df("bedrooms") === 0) &&
        !(df("property_type") <=> "Land")),
    ("no_price", df => df("price") === 0),
    ("no_title", df => df("title").isNull || df("title") === "" || df("title") === "N/A"),
    ("no_description", df => df("description").isNull || df("description") === ""),
    ("no_location", df => df("location").isNull || df("location") === ""),
    ("build_size_greater_than_land_size",
      df => df("build_size").isNotNull && df("build_size") =!= 0 &&
        df("land_size").isNotNull && df("land_size") =!= 0 &&
        df("build_size") > df("land_size")),
    ("no_leasehold_years",
      df => df("contract_type") <=> "Leasehold" &&
        (df("leasehold_years").isNull || df("leasehold_years") === 0)),
    ("not_available", df => !(df("availability") <=> "Available")),
    ("unknown_property_type",
      df => !df("property_type").isin("Villa", "House", "Land", "Apartment",
        "Hotel", "Townhouse", "Commercial", "Loft") || df("property_type").isNull),
    ("land_with_bedrooms",
      df => df("property_type") <=> "Land" && df("bedrooms").isNotNull &&
        df("bedrooms") > 0),
    ("unknown_contract_type",
      df => !df("contract_type").isin("Freehold", "Leasehold", "Rental") ||
        df("contract_type").isNull),
    ("no_land_zoning",
      df => df("property_type") <=> "Land" &&
        (df("land_zoning").isNull || df("land_zoning") === "")))

  /** Append an `issues` array column (distinct labels, reference order). */
  def withIssues(df: DataFrame): DataFrame =
    df.withColumn("issues",
      filter(array(issueRules.map { case (label, cond) =>
        when(cond(df), lit(label))
      }: _*), _.isNotNull))

  /** issues → one Tag row per (id, issue) — the explode that replaces the
    * reference's per-item Tag inserts. Unique-constraint (property_id,
    * name) holds by construction since issues is a set per row.
    */
  def explodeTags(df: DataFrame, idCol: String = "id"): DataFrame =
    withIssues(df)
      .select(col(idCol).as("property_id"), explode(col("issues")).as("name"))

  /** Tag workflow sync (models/property.py:124-138): stale tags (present
    * before, not re-identified) flip is_solved; brand-new (property, name)
    * pairs are inserted. Both are joins, not per-row merges.
    */
  def syncTags(existing: DataFrame, fresh: DataFrame): DataFrame = {
    val e = existing.as("e")
    val f = fresh.as("f")
    val joined = e.join(f,
      col("e.property_id") === col("f.property_id") &&
        col("e.name") === col("f.name"), "full_outer")
    joined.select(
      coalesce(col("e.property_id"), col("f.property_id")).as("property_id"),
      coalesce(col("e.name"), col("f.name")).as("name"),
      // present before but not now → solved; otherwise keep prior state
      when(col("f.name").isNull, lit(true))
        .otherwise(coalesce(col("e.is_solved"), lit(false))).as("is_solved"),
      (col("f.name").isNotNull && col("e.name").isNull).as("is_new"))
  }

  /** Mark-as-solved/ignored (reference tag_routes.py:294-317 bulk PATCH;
    * :258-285 single-row PUT). The two routes write DIFFERENTLY: the bulk
    * PATCH assigns BOTH flags (is_solved = (mode=="solved"), is_ignored =
    * (mode=="ignored")), while the single-row PUT sets only the requested
    * flag and leaves the other untouched. `assignBoth = true` (default)
    * models the bulk route; `assignBoth = false` models the PUT. The id
    * set is a serving-sized request payload, so it broadcasts — the tag
    * table itself never shuffles.
    */
  def markTags(tags: DataFrame, ids: DataFrame, tagName: String,
               mode: String, assignBoth: Boolean = true): DataFrame = {
    val hitSet = broadcast(ids.select(col("property_id")).distinct()
      .withColumn("_hit", lit(true)))
    val touched = col("_hit") && col("name") === tagName
    val writeSolved = assignBoth || mode == "solved"
    val writeIgnored = assignBoth || mode == "ignored"
    tags.join(hitSet, Seq("property_id"), "left_outer")
      .withColumn("is_solved",
        if (writeSolved)
          when(touched, lit(mode == "solved")).otherwise(col("is_solved"))
        else col("is_solved"))
      .withColumn("is_ignored",
        if (writeIgnored)
          when(touched, lit(mode == "ignored")).otherwise(col("is_ignored"))
        else col("is_ignored"))
      .drop("_hit")
  }

  /** Tag detail page (reference tag_routes.py:43-127): properties holding
    * an open (unsolved, unignored) instance of the tag, ordered by source
    * (id tiebreaker for determinism — the ORM's order is otherwise
    * unstable), paginated, first occurrence per url (the loop's
    * `url not in urls` guard), then the reference's per-row N+1 Listing
    * lookup done set-based as one left-outer join on url.
    */
  def tagDetail(props: DataFrame, tags: DataFrame, listings: DataFrame,
                tagName: String, page: Int = 1, size: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val open = tags
      .filter(col("name") === tagName && !col("is_solved") && !col("is_ignored"))
      .select(col("property_id")).distinct()
    val pageRows = props
      .join(open, props("id") === open("property_id"), "left_semi")
      .orderBy(col("source"), col("id"))
      .offset((page - 1) * size).limit(size)
    val w = Window.partitionBy("url").orderBy("source", "id")
    pageRows.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
      .join(listings, Seq("url"), "left_outer")
  }

  /** Required-field audit (reference reid/pipelines/local.py:4-44): which
    * required columns are missing per row, with the reference's
    * conditional exemptions (leasehold_years only when Leasehold, sold_at
    * only when unavailable).
    */
  def missingFields(df: DataFrame, required: Seq[String]): Column =
    filter(array(required.map { f =>
      val missing = f match {
        case "leasehold_years" =>
          df("contract_type") <=> "Leasehold" && df(f).isNull
        case "sold_at" =>
          !(df("is_available") <=> true) && df(f).isNull
        case _ =>
          df(f).isNull || (df(f).cast("string") === "")
      }
      when(missing, lit(f))
    }: _*), _.isNotNull)

  /** Off-plan flag (models/property.py:61-68 + _has_off_plan/_normalize):
    * the literal variants plus the "off ... plan" normalization regex and
    * "under construction".
    */
  def checkOffPlan(title: Column, description: Column, labels: Column): Column = {
    def literal(c: Column): Column = coalesce(
      lower(trim(c)).rlike("off plan|offplan|off-plan|under construction"),
      lit(false))
    // title/description go through _normalize_off_plan (the off...plan
    // regex) before the literal scan; labels are checked literally only
    def normalized(c: Column): Column =
      literal(c) || coalesce(c.rlike("(?i)\\boff([\\s\\d\\w]+)plan\\b"), lit(false))
    normalized(title) || normalized(description) ||
      coalesce(exists(labels, literal), lit(false))
  }

  /** Zoning color → category map, reference priority order
    * (reid/settings.py:145-154; note "green" shadows "dark green" by
    * substring containment, exactly as the reference's dict scan does).
    */
  val zoningColors: Seq[(String, String)] = Seq(
    "yellow" -> "Residential", "red" -> "Commercial", "pink" -> "Tourism",
    "green" -> "Agricultural", "dark green" -> "Green", "orange" -> "Sacred",
    "grey" -> "Industrial", "blue" -> "Special")
  val zoningCategories: Seq[(String, String)] = Seq(
    "residential" -> "Residential", "commercial" -> "Commercial",
    "tourism" -> "Tourism")

  /** Land zoning (models/property.py:155-194): sentence-split the
    * description (the reference's colon-newline normalization then \n and
    * "." splits), keep sentences starting with "zoning", then color lookup
    * first, keyword lookup second.
    */
  def defineLandZoning(propertyType: Column, description: Column): Column = {
    val text0 = regexp_replace(description, "\\n:+\\n", ":")
    val text1 = lower(regexp_replace(text0, "(?<=:)\\n+", " "))
    val sentences = flatten(transform(split(text1, "\n"), l => split(l, "\\.")))
    val zoned = filter(sentences, s => s.rlike("(?i)^zoning"))
    val colorHit = zoningColors.foldLeft(lit(null).cast("string")) {
      case (acc, (clr, label)) =>
        coalesce(acc, when(exists(zoned, _.contains(clr)), label))
    }
    val catHit = zoningCategories.foldLeft(lit(null).cast("string")) {
      case (acc, (zn, label)) =>
        coalesce(acc, when(exists(zoned, _.contains(zn)), label))
    }
    when(propertyType === "Land", coalesce(colorHit, catHit))
  }

  /** Declarative data-quality CONSTRAINT check (the Deequ/Great-
    * Expectations shape): row-level predicates ("every row satisfies
    * P") and uniqueness constraints ("no key repeats"), all evaluated
    * against one table in a BOUNDED number of aggregate passes — one
    * pass for every predicate (a single multi-aggregate over
    * conditional counts) plus one count-distinct pass per unique key.
    * Output: one row per constraint — passing count, total, the
    * verdict — the gate a 100 TB ingest runs before a snapshot is
    * promoted.
    *
    * Scale shape: predicates partial-aggregate map-side into |rules|
    * counters per task; uniqueness is the standard two-level distinct
    * aggregate. Nothing is row-materialized per constraint.
    */
  def constraintCheck(df: DataFrame,
                      predicates: Seq[(String, Column)],
                      uniqueKeys: Seq[(String, Seq[String])] = Nil)
      : DataFrame = {
    require(predicates.nonEmpty || uniqueKeys.nonEmpty,
      "constraintCheck needs at least one constraint")
    val spark = df.sparkSession
    import spark.implicits._
    val predRows: Option[DataFrame] =
      if (predicates.isEmpty) None
      else {
        val aggs = count(lit(1)).as("_total") +:
          predicates.zipWithIndex.map { case ((_, p), i) =>
            sum(when(p, 1L).otherwise(0L)).as(s"_p$i")
          }
        val one = df.agg(aggs.head, aggs.tail: _*)
        Some(one.select(explode(array(predicates.zipWithIndex.map {
          case ((name, _), i) => struct(lit(name).as("constraint"),
            col(s"_p$i").as("n_pass"), col("_total").as("n_total"))
        }: _*)).as("c")).select("c.*"))
      }
    val uniqRows = uniqueKeys.map { case (name, cols0) =>
      df.agg(count(lit(1)).as("n_total"),
          countDistinct(cols0.head, cols0.tail: _*).as("n_distinct"))
        .select(lit(name).as("constraint"),
          col("n_distinct").as("n_pass"), col("n_total"))
    }
    (predRows.toSeq ++ uniqRows).reduce(_ unionByName _)
      .withColumn("ok", col("n_pass") === col("n_total"))
      .orderBy("constraint")
  }
}
