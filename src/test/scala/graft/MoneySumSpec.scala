package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine-neutral money aggregation discipline that closed r02's
  * five hash failures: the output must be DOUBLE (decimal outputs render
  * scale-aware on a pyarrow read but float-like on a duckdb read, so any
  * value with a trailing-zero last digit hash-mismatches), and the value
  * must be the exact integer-quantized sum.
  */
class MoneySumSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def df(vals: Double*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map(Row(_))),
      StructType(Seq(StructField("v", DoubleType))))

  test("moneySum output type is DOUBLE, never decimal") {
    val out = df(1.0).agg(Relational.moneySum(col("v"), 2).as("s"))
    assert(out.schema("s").dataType == DoubleType)
    val w = Window.partitionBy(lit(1)).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outW = df(1.0).select(Relational.moneySumOver(col("v"), 2, w).as("s"))
    assert(outW.schema("s").dataType == DoubleType)
  }

  test("trailing-zero sums stay exact (the r02 failure shape)") {
    // 1.30 + 2.70 = 4.00 — a decimal(18,2) column would render "4.00"
    // on the pyarrow path and 4.0 on the duckdb path
    val s = df(1.30, 2.70).agg(Relational.moneySum(col("v"), 2))
      .collect().head.getDouble(0)
    assert(s == 4.0)
  }

  test("quantization is exact where the double is representable noise") {
    // 0.1 + 0.2 in double is 0.30000000000000004; integer cents fix it
    val s = df(0.1, 0.2).agg(Relational.moneySum(col("v"), 2))
      .collect().head.getDouble(0)
    assert(s == 0.3)
  }

  test("negative values follow the binary value, not the decimal literal") {
    // -1.005 in binary is -1.00499999999999989…, so BOTH engines round
    // the cents to -100 (Spark rounds the shortest repr of v*100 =
    // "-100.49999999999999"; DuckDB rounds the same binary) — the sum is
    // -3.0, NOT the -3.01 a decimal-literal reading would suggest
    val s = df(-1.005, -2.0).agg(Relational.moneySum(col("v"), 2))
      .collect().head.getDouble(0)
    assert(s == -3.0)
  }

  test("scale-4 quantization matches the oracle's 10000 factor") {
    val s = df(0.12345).agg(Relational.moneySum(col("v"), 4))
      .collect().head.getDouble(0)
    assert(s == 0.1235) // rounds at the 4th decimal, presented exactly
  }
}
