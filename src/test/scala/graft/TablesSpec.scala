package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the loader contract of `Tables.normalizeTs`: whatever parquet
  * layout the generator picks for `events.ts` — nanos-as-long (the
  * TIMESTAMP(NANOS) read path under nanosAsLong=true), plain
  * timestamp[us] (TIMESTAMP_NTZ in Spark 4), or UTC-adjusted
  * timestamp[us] (TIMESTAMP) — the loaded column is TimestampType with
  * identical µs-since-epoch values. A generator layout change must
  * never silently take out the temporal query family again (r10 broke
  * exactly this way when the driver switched NANOS → timestamp[us]).
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // three instants that exercise µs precision and a pre-1970 value
  private val micros = Seq(1700000000123456L, 1700000000123457L, -5000001L)

  private def writeRead(df: DataFrame): DataFrame = {
    val dir = Files.createTempDirectory("graft-tables-spec").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/events.parquet"
    df.write.mode("overwrite").parquet(path)
    Tables.normalizeTs(spark.read.parquet(path), "ts")
  }

  private def loadedMicros(df: DataFrame): Seq[Long] = {
    assert(df.schema("ts").dataType == TimestampType, df.schema("ts").dataType)
    df.select(unix_micros(col("ts"))).as[Long].collect().toSeq.sorted
  }

  test("nanos-as-long layout surfaces as TimestampType with truncated-µs values") {
    // TIMESTAMP(NANOS) under nanosAsLong=true arrives as a raw Long column;
    // writing LongType directly exercises the identical loader branch.
    // Sub-µs noise only on post-epoch values: `div` truncates toward zero,
    // and the generator emits no pre-1970 events.
    val ns = micros.map(u => u * 1000L + (if (u >= 0) 789L else 0L))
    val df = writeRead(ns.toDF("ts"))
    assert(loadedMicros(df) == micros.sorted)
  }

  test("timestamp[us] NTZ layout surfaces as TimestampType with identical values") {
    val ntz = micros
      .toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val df = writeRead(ntz)
    assert(loadedMicros(df) == micros.sorted)
  }

  test("UTC-adjusted timestamp[us] layout passes through unchanged") {
    val tz = micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    assert(tz.schema("ts").dataType == TimestampType)
    val df = writeRead(tz)
    assert(loadedMicros(df) == micros.sorted)
  }

  private def writeReadNaive(df: DataFrame): DataFrame = {
    val dir = Files.createTempDirectory("graft-tables-spec").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/orders.parquet"
    df.write.mode("overwrite").parquet(path)
    Tables.normalizeTsNaive(spark.read.parquet(path), "ts")
  }

  private def loadedNaiveMicros(df: DataFrame): Seq[Long] = {
    assert(df.schema("ts").dataType == TimestampNTZType,
      df.schema("ts").dataType)
    df.select(unix_micros(col("ts").cast(TimestampType)))
      .as[Long].collect().toSeq.sorted
  }

  test("normalizeTsNaive lands every layout on TIMESTAMP_NTZ, same values") {
    val posMicros = micros.filter(_ >= 0)
    // nanos-long
    val ns = writeReadNaive(posMicros.map(u => u * 1000L + 789L).toDF("ts"))
    assert(loadedNaiveMicros(ns) == posMicros.sorted)
    // UTC-adjusted timestamp[us]
    val tz = writeReadNaive(
      posMicros.toDF("us").select(timestamp_micros(col("us")).as("ts")))
    assert(loadedNaiveMicros(tz) == posMicros.sorted)
    // plain timestamp[us] (NTZ) passes through untouched
    val ntz = writeReadNaive(posMicros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
    assert(loadedNaiveMicros(ntz) == posMicros.sorted)
  }

  test("the real orders/lineitem date columns load as TIMESTAMP_NTZ") {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    assert(Tables.orders(spark, sf).schema("o_orderdate")
      .dataType == TimestampNTZType)
    assert(Tables.lineitem(spark, sf).schema("l_shipdate")
      .dataType == TimestampNTZType)
  }

  test("the real generated events table loads as TimestampType") {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(1).count() == 1L)
  }
}
