package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 re-expressed
  * Spark-first over the driver testdata tables; `oracleSql` holds the
  * DuckDB-equivalent SQL for the hash-compare correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Monthly new-listing counts (SURVEY §2.4; reference
    * api/routers/analytics_routes.py:22-47) mapped onto `events`.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.q01MonthlyCounts(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] = Queries.oracle
}
