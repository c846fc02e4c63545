package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q38 promotion: [[Similarity.blockedLshNearestNeighbor]] (the
  * registered LSH-banded execution) against the exact block self-join
  * [[Similarity.blockedNearestNeighbor]] (the pedagogical variant).
  * Banding is a candidate FILTER over the same exact-cosine verify, so
  * wherever a vector's true block nearest neighbor lands in its
  * hyperplane bucket the two forms must score identically — and the
  * banded form must keep every vector (n_peers = 0 when its
  * (label, bucket) cell is a singleton).
  */
class BlockedLshSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(64)(i => ((seed * 31 + i * 7) % 13 - 6).toFloat / 3f)

  test("identical vectors share a bucket and match at cosine 1.0; " +
    "the block boundary still separates them") {
    val v = vec(3)
    val df = Seq((1L, v, 0), (2L, v, 0), (3L, v, 1), (4L, vec(9), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity
      .blockedLshNearestNeighbor(df, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 4, "every vector keeps a row")
    // 1 and 2 are identical AND same label → guaranteed candidates
    assert(out(1L).getAs[Long]("best_nn") == 2L)
    // n2 / (sqrt(n2) * sqrt(n2)) rounds to 1 ± 1 ulp in IEEE
    assert(math.abs(out(1L).getAs[Double]("best_cos") - 1.0) < 1e-12)
    assert(out(2L).getAs[Long]("best_nn") == 1L)
    // 3 is identical to 1/2 but label 1 → never a candidate despite the
    // shared bucket; its cell is a singleton
    assert(out(3L).getAs[Long]("n_peers") == 0L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("best_nn")))
  }

  test("sf0.001: row-per-vector, and wherever the exact block NN shares " +
    "the bucket the banded form scores the same best cosine") {
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val lsh = Similarity
      .blockedLshNearestNeighbor(emb, "vec_id", "embedding", "label")
    val exact = Similarity
      .blockedNearestNeighbor(emb, "vec_id", "embedding", "label")
    assert(lsh.count() == n, "banded output must keep every vector")
    val buckets = lsh.select(col("vec_id"), col("bucket"))
    val joined = exact
      .join(buckets, Seq("vec_id"))
      .join(buckets.select(col("vec_id").as("nn_id"),
        col("bucket").as("nn_bucket")), Seq("nn_id"))
      .join(lsh.select(col("vec_id"), col("best_cos")), Seq("vec_id"))
    val colocated = joined.filter(col("bucket") === col("nn_bucket"))
    val nColocated = colocated.count()
    assert(nColocated > 0, "fixture has no co-bucketed true NN — spec is vacuous")
    // the true NN is a candidate → the banded max cosine equals the exact
    // one (partners may differ only on exact-cosine ties)
    val mismatched = colocated
      .filter(col("best_cos") =!= col("cosine")).count()
    assert(mismatched == 0,
      s"$mismatched of $nColocated co-bucketed vectors scored below exact")
  }
}
