package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The inverted-index execution of n-gram Jaccard best-partner
  * (`ngramJaccardBestInverted`) must be bit-equal to the block
  * self-join form (`ngramJaccardBest`) — same rows, same partners, same
  * IEEE jaccard — including the zero-overlap fallback (lowest other id
  * in the block) and singleton blocks (no row). Corpora keep every doc
  * at ≥ 3 words (the documented empty-set precondition).
  */
class NgramVariantSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def both(rows: Seq[(Long, String, String)])
      : (Set[(Long, Long, Double)], Set[(Long, Long, Double)]) = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "text", "block")
    def collect(out: org.apache.spark.sql.DataFrame) =
      out.select("doc_id", "partner", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
    val a = collect(TextOps.ngramJaccardBest(df, "doc_id", "text", Seq("block")))
    Caches.clear()
    val b = collect(TextOps.ngramJaccardBestInverted(df, "doc_id", "text", Seq("block")))
    Caches.clear()
    (a, b)
  }

  test("fixture: overlap, zero-overlap fallback, singleton block") {
    val rows = Seq(
      // block A: 1-2 near-dups, 3 shares nothing with either (fallback
      // rows must point at the lowest other id: 3→1; 1/2 pair normally)
      (1L, "the quick brown fox jumps over the lazy dog today", "A"),
      (2L, "the quick brown fox jumps over the lazy dog tonight", "A"),
      (3L, "entirely disjoint words carrying zero shared shingles whatsoever here", "A"),
      // block B: a singleton — neither form emits a row for it
      (4L, "alone in this block with nobody to pair against ever", "B"),
      // block C: two docs, zero overlap — both rows are pure fallback
      (5L, "first unrelated sentence with its own private vocabulary only", "C"),
      (6L, "second text made from different tokens sharing nothing at all", "C"))
    val (selfJoin, inverted) = both(rows)
    assert(selfJoin == inverted, s"self=$selfJoin inv=$inverted")
    assert(selfJoin.map(_._1) == Set(1L, 2L, 3L, 5L, 6L)) // 4 absent
    assert(selfJoin.exists(r => r._1 == 3L && r._2 == 1L && r._3 == 0.0))
    assert(selfJoin.exists(r => r._1 == 5L && r._2 == 6L && r._3 == 0.0))
    assert(selfJoin.exists(r => r._1 == 1L && r._2 == 2L && r._3 > 0.5))
  }

  test("randomized corpora: forms agree on every draw (fixed seeds)") {
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
    for (seed <- Seq(11, 47, 101)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 40).map { i =>
        val len = 3 + rnd.nextInt(10)
        val text = Seq.fill(len)(words(rnd.nextInt(words.size))).mkString(" ")
        (i.toLong, text, s"b${rnd.nextInt(3)}")
      }
      val (selfJoin, inverted) = both(rows)
      assert(selfJoin == inverted,
        s"seed $seed: diff=${(selfJoin diff inverted) ++ (inverted diff selfJoin)}")
      assert(selfJoin.nonEmpty)
    }
  }
}
