package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sinks

/** Pins the Morton interleave math and the layout property behind
  * [[Sinks.writeZOrdered]]: z-sorted files carry tight parquet min/max
  * on BOTH dimensions, which is the whole point of the layout.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zValue interleaves bits: hand-computed Morton codes") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L),
      (5L, 6L)).toDF("a", "b")
    val out = df.select(Sinks.zValue(col("a"), col("b"), bits = 4))
      .collect().map(_.getLong(0)).toSeq
    // z = a bits in even positions, b bits in odd:
    // (2,3) = a:10 b:11 -> b1 a1 b0 a0 ... = 1 1 1 0 -> 0b1110 = 14
    // (5,6) = a:101 b:110 -> val = interleave = 0b110011 = 51?
    //   a=101, b=110: bit0: a0=1,b0=0 -> 01; bit1: a1=0,b1=1 -> 10;
    //   bit2: a2=1,b2=1 -> 11  => 11 10 01 = 0b111001 = 57
    assert(out == Seq(0L, 1L, 2L, 3L, 14L, 57L))
  }

  test("writeZOrdered: per-file min/max are tight on BOTH dimensions") {
    // 2^6 x 2^6 grid, 16 files: each z-range file must cover a small
    // RECTANGLE of the grid, so per-file spans on each dim stay far
    // under the full range; a ts-linear layout would span user fully
    val grid = spark.range(64L * 64).select(
      (col("id") % 64).as("user_id"),
      expr("id div 64").as("ts_bucket"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_zorder_spec_").toString + "/t"
    Sinks.writeZOrdered(grid, path, col("user_id"), col("ts_bucket"),
      numFiles = 16, bits = 6)
    val withFile = spark.read.parquet(path)
      .select(col("user_id"), col("ts_bucket"),
        input_file_name().as("f"))
    val spans = withFile.groupBy("f")
      .agg((max("user_id") - min("user_id")).as("u_span"),
        (max("ts_bucket") - min("ts_bucket")).as("t_span"))
      .collect()
    assert(spans.length > 1)
    // AVERAGE spans: a perfect 16-way z split is 16×16 quadrants
    // (span 15); repartitionByRange samples boundaries, so a few files
    // straddle quadrant transitions and span wider — the average still
    // sits far below the full range on BOTH dims, where a ts-linear
    // layout averages the full 63 on user_id
    def avg(c: String) = spans.map(_.getAs[Long](c)).sum.toDouble / spans.length
    assert(avg("u_span") < 24, spans.map(_.toString).mkString("\n"))
    assert(avg("t_span") < 24, spans.map(_.toString).mkString("\n"))
  }
}
