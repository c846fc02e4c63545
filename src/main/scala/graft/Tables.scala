package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  * One parquet file per table under the scale-factor dir.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** A valid, collision-free warehouse-table prefix for a per-dataset
    * shared standing build (the q165/q169 staged-index discipline):
    * tag + the SANITIZED dataset path — injective up to
    * non-alphanumeric runs, so distinct dirs never alias (an earlier
    * hashCode-based prefix could collide, and abs(Int.MinValue) is
    * negative). */
  private[graft] def tablePrefix(tag: String, d: String): String =
    tag + "_" + d.toLowerCase.replaceAll("[^a-z0-9]+", "_")
      .replaceAll("^_+|_+$", "")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame =
    normalizeTsNaive(load(s, d, "orders"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    normalizeTsNaive(load(s, d, "lineitem"), "l_shipdate")
  /** events.ts arrives in whichever parquet layout the generator used:
    * TIMESTAMP(NANOS) (surfaces as Long ns with
    * spark.sql.legacy.parquet.nanosAsLong=true), plain timestamp[us]
    * (surfaces as TIMESTAMP_NTZ in Spark 4), or UTC-adjusted
    * timestamp[us] (already TIMESTAMP). Normalize all three to
    * TimestampType so downstream unix_micros/timestamp_micros kernels
    * always see the same type and value.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(load(s, d, "events"), "ts")

  /** Contract: after this call, `tsCol` is TimestampType with the same
    * µs-since-epoch value DuckDB reads from the file (session TZ is
    * pinned UTC, so the NTZ→TZ cast is value-preserving).
    */
  def normalizeTs(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType =>
        // Integer division, not floor(double): 2020s ns epochs (~1.7e18)
        // exceed double's 53-bit mantissa and would round across µs
        // boundaries; `div` matches DuckDB's exact integer truncation.
        df.withColumn(tsCol, expr(s"timestamp_micros($tsCol div 1000)"))
      case TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case _ => df
    }
  /** [[normalizeTs]]'s NAIVE-side twin for date-like columns that
    * queries emit RAW (o_orderdate, l_shipdate): the driver's oracle
    * compare reads DuckDB's output of a `timestamp[us]` file as a
    * naive timestamp, so these columns must stay TIMESTAMP_NTZ — but a
    * generator flip to TIMESTAMP(NANOS) (Long under nanosAsLong) or to
    * UTC-adjusted µs must not change what downstream sees. All layouts
    * land on TimestampNTZType; UTC session makes every cast
    * value-preserving. (events.ts goes the OTHER way, to TimestampType,
    * because its µs-arithmetic kernels require TIMESTAMP — it is never
    * emitted raw.)
    */
  def normalizeTsNaive(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol,
          expr(s"timestamp_micros($tsCol div 1000)").cast(TimestampNTZType))
      case TimestampType =>
        df.withColumn(tsCol, col(tsCol).cast(TimestampNTZType))
      case _ => df
    }

  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
