package graft

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 re-expressed
  * Spark-first over the driver testdata tables; `oracleSql` holds the
  * DuckDB-equivalent SQL for the hash-compare correctness gate.
  */
object SparkEntry {

  /** Flagship: the full ingest slice standardize → quality → merge
    * (SURVEY §3.1 stages 3-7 as one job). Raw "scraped items" are
    * synthesized from the documents table, pushed through the ItemLoader-
    * equivalent standardization, the 12 quality rules, and the listing
    * MERGE against a current table built from the relational fixtures.
    * Output: per-tab/issue-count summary — driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val asOf = LocalDate.of(2026, 8, 15)
    val docs = Tables.documents(spark, d)
    val raw = docs.select(
      concat(lit("u"), col("doc_id")).as("url"),
      col("source"),
      concat(lit("Stunning "), (col("doc_id") % 6 + 1),
        lit(" bedroom villa in Ubud")).as("raw_title"),
      when(col("doc_id") % 3 === 0,
        concat(lit("IDR "), (col("doc_id") + 1) * 1000000))
        .when(col("doc_id") % 3 === 1,
          concat(lit("USD "), (col("doc_id") + 1) * 100))
        .otherwise(lit("price request")).as("raw_price"),
      when(col("doc_id") % 4 === 0, "Land for Sale")
        .otherwise(lit("Villa")).as("raw_type"),
      when(col("doc_id") % 2 === 0, "leasehold property")
        .otherwise(lit("freehold")).as("raw_contract"),
      concat(col("text"), lit("\nleasehold 25 years"),
        when(col("doc_id") % 4 === 0, lit("\nzoning: yellow area"))
          .otherwise(lit(""))).as("raw_desc"),
      when(col("doc_id") % 11 === 0, array(lit("SOLD out")))
        .otherwise(array(lit("For Sale"))).as("labels"),
      lit("https://x.com/img-300x200.jpg").as("raw_image"))
    val standardized = Standardize(raw, asOf)
    val withIssues = Quality.withIssues(standardized)
    val current = EtlQueries.currentListings(spark, d)
    val merged = Merge.merge(current, standardized, asOf)
    val tabCounts = merged.groupBy("tab").agg(count(lit(1)).as("n"))
      .select(col("tab").as("metric"), col("n"))
    val issueCounts = withIssues
      .select(explode(col("issues")).as("issue"))
      .groupBy("issue").agg(count(lit(1)).as("n"))
      .select(col("issue").as("metric"), col("n"))
    tabCounts.unionByName(issueCounts)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] = Queries.oracle
}
