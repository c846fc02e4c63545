package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic corpus splits (`TextOps.splitAssign` / `splitReport`):
  * a doc's train/val/test assignment is a pure function of its id, so
  * reruns and incremental ingests never move a doc across splits — the
  * leakage guarantee training pipelines rely on.
  */
class SplitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("assignment is a pure function of id and hits the cut shares") {
    import spark.implicits._
    val ids = (0L until 2000L).toDF("id")
    val once = ids.select(col("id"), TextOps.splitAssign(col("id")).as("s"))
      .as[(Long, String)].collect().toMap
    val again = ids.orderBy(desc("id")) // different order, same answer
      .select(col("id"), TextOps.splitAssign(col("id")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(once == again)
    val n = once.size.toDouble
    val shares = once.values.groupBy(identity).view.mapValues(_.size / n)
    // md5 buckets are uniform: 2000 ids land within a few points of the
    // 80/10/10 cuts (binomial 3σ ≈ ±2.7pp on the 80% cut)
    assert(math.abs(shares("train") - 0.80) < 0.04, shares.toMap)
    assert(math.abs(shares("val") - 0.10) < 0.03, shares.toMap)
    assert(math.abs(shares("test") - 0.10) < 0.03, shares.toMap)
  }

  test("custom cuts are honored; malformed cuts are rejected") {
    import spark.implicits._
    val ids = (0L until 500L).toDF("id")
    val half = ids.select(
        TextOps.splitAssign(col("id"), Seq("a" -> 50, "b" -> 100)).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(half.keySet == Set("a", "b"))
    assert(math.abs(half("a") - 250L) < 60, half)
    intercept[IllegalArgumentException] {
      TextOps.splitAssign(col("id"), Seq("a" -> 90, "b" -> 80))
    }
    intercept[IllegalArgumentException] {
      TextOps.splitAssign(col("id"), Seq("a" -> 50))
    }
  }

  test("rebalance: overrepresented lang capped near target, small lang kept") {
    import spark.implicits._
    // en: 400 docs × 10 tokens = 4000; de: 30 docs × 10 = 300; target 1000
    val docs = ((0L until 400L).map(i => (i, "ten tokens of filler text " +
        s"pad pad pad pad $i", "en")) ++
      (1000L until 1030L).map(i => (i, s"zehn worte fuellung text pad pad " +
        s"pad pad pad $i", "de")))
      .toDF("doc_id", "text", "lang")
    val out = TextOps.rebalanceCorpus(docs, "doc_id", "text", "lang", 1000L)
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val en = out("en"); val de = out("de")
    assert(de._5 == de._4 && de._6 == 1.0)   // under target: kept whole
    assert(en._6 == 0.25)                     // 1000/4000 exactly
    // binomial(400, 0.25): 100 ± 3σ ≈ ± 26 docs → tokens within the band
    assert(math.abs(en._5 - 1000L) < 270, s"en after ${en._5}")
    assert(en._3 < en._2)                     // genuinely downsampled
    // deterministic: same corpus, same answer
    val again = TextOps.rebalanceCorpus(docs, "doc_id", "text", "lang", 1000L)
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(again == out)
  }

  test("leakage repair: a near-dup cluster lands on ONE side of the split") {
    import spark.implicits._
    val dupText = "an identical boilerplate page repeated across many mirror " +
      "urls with the same body text token for token every single time"
    val docs = ((0L until 12L).map(i => (i, dupText)) ++
      Seq((100L, "a unique standalone document with entirely original words"),
        (101L, "another singleton nothing like the rest of this tiny corpus")))
      .toDF("doc_id", "text")
    val out = TextOps.splitLeakage(docs, "doc_id", "text")
      .as[(Long, Long, String, String, Boolean)].collect()
    Caches.clear()
    val byId = out.map(r => r._1 -> r).toMap
    // the 12 identical docs form one cluster rooted at 0 and ALL get the
    // representative's split — no doc of the family on the other side
    val family = (0L until 12L).map(byId)
    assert(family.forall(_._2 == 0L), family.mkString(","))
    assert(family.map(_._4).distinct.size == 1)
    assert(family.head._4 == byId(0L)._3) // repaired = rep's naive split
    // moved is exactly "naive disagrees with repaired"
    assert(out.forall(r => r._5 == (r._3 != r._4)))
    // singletons: own component, nothing moves
    assert(byId(100L)._2 == 100L && !byId(100L)._5)
    assert(byId(101L)._2 == 101L && !byId(101L)._5)
  }

  test("report: token shares sum to 1 per lang; disjoint exhaustive docs") {
    import spark.implicits._
    val docs = (0L until 300L)
      .map(i => (i, s"some text body number $i with a few tokens",
        if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val rep = TextOps.splitReport(docs, "doc_id", "text", "lang")
    val rows = rep.as[(String, String, Long, Long, Double)].collect()
    // every doc lands in exactly one (split, lang) cell
    assert(rows.map(_._3).sum == 300L)
    // shares within each lang sum to 1 (rounded to 1e-6 per row)
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val tot = rs.map(_._5).sum
      assert(math.abs(tot - 1.0) < 1e-4, s"$lang shares sum to $tot")
    }
    // deterministic: rerunning the report is bit-identical
    val rows2 = TextOps.splitReport(docs, "doc_id", "text", "lang")
      .as[(String, String, Long, Long, Double)].collect()
    assert(rows.toSeq == rows2.toSeq)
  }
}
