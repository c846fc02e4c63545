package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the LSH skew posture. An all-identical-docs corpus is the
  * pathological case for every banded candidate join: all n docs carry
  * the same signature, so every band maps the whole corpus into ONE
  * bucket — the worst skew the band self-join can see. Two properties
  * keep that survivable at corpus scale, and both are pinned here so a
  * config or banding change that silently breaks them fails the suite:
  *
  *  1. The session posture: AQE with skew-join splitting enabled, so the
  *     one giant bucket's join partitions get split at runtime instead
  *     of a single straggler task OOMing.
  *  2. The collision-bound law: candidate pairs are distinct'd across
  *     bands, so the pathological bucket costs C(n,2) verified pairs —
  *     NOT bands × C(n,2) — and the band/row split (bandsCount bands ×
  *     2 rows = all perms) stays consistent if someone widens the
  *     banding.
  */
class LshSkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("session posture: AQE + skew-join splitting enabled (the shipped default)") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "AQE disabled — the LSH band join's skew posture is gone")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true",
      "AQE skew-join splitting disabled — a pathological bucket becomes one straggler task")
  }

  test("all-identical corpus: band join completes at the exact collision bound") {
    import spark.implicits._
    val n = 80
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val df = (1 to n).map(i => (i.toLong, text)).toDF("doc_id", "text")
    val (_, pairs) = TextOps.lshVerifiedPairs(df, "doc_id", "text")
    try {
      val rows = pairs.collect()
      // every doc collides with every other in EVERY band; the distinct
      // collapses the 4× multiplicity to exactly C(n,2)
      assert(rows.length == n * (n - 1) / 2,
        s"pair count ${rows.length} != collision bound ${n * (n - 1) / 2}")
      assert(rows.forall(_.getAs[Double]("jaccard") == 1.0))
      // and the join genuinely ran under AQE, where the skew handling lives
      assert(pairs.queryExecution.executedPlan.toString
        .contains("AdaptiveSparkPlan"))
    } finally Caches.clear()
  }

  test("banding split covers all permutations (widening bands needs matching perms)") {
    assert(TextOps.minhashPerms.size == 2 * TextOps.bandsCount,
      "bandsCount × 2 rows must consume exactly the minhash permutation list")
  }

  test("simhash banding survives the same all-identical worst case at its bound") {
    import spark.implicits._
    val n = 80
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val df = (1 to n).map(i => (i.toLong, text)).toDF("doc_id", "text")
    // identical docs → identical fingerprints → one hot bucket per band;
    // the hamming filter runs BEFORE the distinct (shrinking its input),
    // and the distinct collapses 4× band multiplicity to exactly C(n,2)
    val (_, pairs) = TextOps.simhashBandedPairs(df, "doc_id", "text",
      maxHamming = 3)
    try {
      val rows = pairs.collect()
      assert(rows.length == n * (n - 1) / 2,
        s"pair count ${rows.length} != collision bound ${n * (n - 1) / 2}")
      assert(rows.forall(_.getAs[Int]("hamming") == 0))
    } finally Caches.clear()
  }
}
