package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q84 ↔ q86 twin relationship: the `approx_percentile`
  * (t-digest) report must land inside a ±1-percentile-rank bracket of
  * the exact `percentile` values on the same data. The sketch's
  * guarantee at accuracy 10000 is rank error ≤ max(1, n/10000) ranks —
  * far inside the ±1% bracket for the fixture groups — so a drift here
  * means the twin stopped computing the same statistic, not noise.
  * (q86 itself is registry-checked rows-only: sketch outputs are
  * engine-specific, so no DuckDB oracle can hash-match them.)
  */
class ApproxTwinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"
  private val eps = 1e-6 // q86 rounds to 6 decimals

  test("q86 approx percentiles bracket q84's exact ones per event type") {
    val approx = Temporal.q86PercentilesApprox(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val brackets = Tables.events(spark, sfDir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        percentile(col("value"), lit(0.49)).as("lo50"),
        percentile(col("value"), lit(0.51)).as("hi50"),
        percentile(col("value"), lit(0.89)).as("lo90"),
        percentile(col("value"), lit(0.91)).as("hi90"),
        percentile(col("value"), lit(0.985)).as("lo99"),
        percentile(col("value"), lit(0.995)).as("hi99"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.nonEmpty && approx.keySet == brackets.keySet)
    approx.foreach { case (t, a) =>
      val e = brackets(t)
      assert(a.getAs[Long]("n") == e.getAs[Long]("n"), s"$t count")
      for ((p, lo, hi) <- Seq(("p50", "lo50", "hi50"),
        ("p90", "lo90", "hi90"), ("p99", "lo99", "hi99"))) {
        val v = a.getAs[Double](p)
        assert(v >= e.getAs[Double](lo) - eps && v <= e.getAs[Double](hi) + eps,
          s"$t $p=$v outside [${e.getAs[Double](lo)}, ${e.getAs[Double](hi)}]")
      }
    }
  }

  /** q82 ↔ q91 twin: the HLL++ distinct counts must land within the
    * sketch's rsd bound of the exact countDistinct per cell. rsd is
    * 0.01, so ±5σ (5%) with a floor of ±2 users for tiny cells is a
    * drift-vs-noise boundary: a violation means the twin stopped
    * counting the same thing. Same cells, same ordering, same derived
    * retention-rate column structure.
    */
  test("q91 approx retention cohorts bracket q82's exact counts per cell") {
    val exact = Temporal.q82Retention(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_active"))
      .toMap
    val approx = Temporal.q91RetentionApprox(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_active"))
      .toMap
    assert(exact.nonEmpty && exact.keySet == approx.keySet)
    exact.foreach { case (cell, n) =>
      val a = approx(cell)
      val tol = math.max(2.0, 0.05 * n)
      assert(math.abs(a - n) <= tol,
        s"$cell approx=$a exact=$n tolerance=$tol")
    }
  }

  test("q126 SQ8: reconstruction error bounded by span/255 per dim, " +
    "identical vectors always agree, cosines stay bracketed") {
    import spark.implicits._
    // deterministic synthetic vectors in two blocks; rows 1/2 and 4/5
    // are IDENTICAL pairs — under ANY quantizer an identical pair has
    // cosine 1.0 in both precisions and must be its twin's top-1 in
    // both (agree = true by construction)
    def vec(seed: Int): Seq[Float] =
      (0 until 64).map(i => (((seed * 31 + i * 7) % 200) - 100) / 50.0f)
    val rows = Seq(
      (1L, vec(3), 0), (2L, vec(3), 0), (3L, vec(9), 0),
      (4L, vec(5), 1), (5L, vec(5), 1), (6L, vec(11), 1))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.sq8Recall(df, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((a, b) <- Seq((1L, 2L), (2L, 1L), (4L, 5L), (5L, 4L))) {
      assert(out(a).getAs[Long]("nn_exact") == b)
      assert(out(a).getAs[Long]("nn_sq8") == b)
      assert(out(a).getAs[Boolean]("agree"))
      assert(out(a).getAs[Double]("cos_exact") == 1.0)
      assert(out(a).getAs[Double]("cos_sq8") == 1.0)
    }
    // the SQ8 cosine of every reported top-1 stays inside a loose
    // bracket of the exact one: per-dim reconstruction error ≤
    // span/255 + 1 milliunits, which for these unit-ish vectors keeps
    // |Δcos| well under 0.05 — a quantizer bug (wrong span, off-by-one
    // scale) blows far past this
    for ((_, r) <- out) {
      val d = math.abs(r.getAs[Double]("cos_exact") -
        r.getAs[Double]("cos_sq8"))
      assert(d < 0.05, s"cosine drifted $d under SQ8")
    }
  }
}
