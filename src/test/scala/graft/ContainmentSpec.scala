package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Winnowed-fingerprint containment (`TextOps.containmentPairs`): the
  * partial-duplicate detector. The planted case is the one symmetric
  * near-dup misses — a doc EMBEDDED in a much larger one scores low
  * word-shingle Jaccard (the big doc's union dilutes it) but high
  * containment over the selected prints.
  */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val inner =
    "the core document text that gets embedded verbatim inside a larger wrapper and must be detected by containment"
  private val wrapper =
    "unrelated preface material goes on for a while establishing context nobody asked for " +
      inner +
      " and then an equally unrelated appendix trails the quoted body with more filler prose"

  test("embedded doc: high containment, found; jaccard too low for LSH") {
    import spark.implicits._
    val df = Seq(
      (1L, inner), (2L, wrapper),
      (3L, "a completely different document about something else entirely with its own words and phrasing throughout"))
      .toDF("doc_id", "text")
    val out = TextOps.containmentPairs(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect()
    Caches.clear()
    assert(out.map(r => (r._1, r._2)).toSet == Set((1L, 2L)), s"${out.toSeq}")
    // winnowing guarantee: every window of the inner doc that lies fully
    // inside the wrapper selects the same minima → near-total overlap
    assert(out.head._4 >= 0.8, s"containment ${out.head._4}")
    // the same pair is INVISIBLE to the symmetric jaccard path at its
    // dedup threshold — the union dilution this operator exists for
    val jac = TextOps.lshVerifiedPairs(df, "doc_id", "text")._2
      .filter(col("jaccard") >= 0.8).count()
    Caches.clear()
    assert(jac == 0, "LSH found the embedded pair; fixture too similar")
  }

  test("decontaminate: train doc embedding an eval item is flagged, " +
    "eval-eval and train-train overlaps are not") {
    import spark.implicits._
    // 100 = eval item; 1 = train doc quoting it verbatim (the wrapper);
    // 2 = clean train doc; 200 = second eval item, duplicated at 201 —
    // an eval-eval dup must NOT appear (both on the eval side)
    val evalDup =
      "this second benchmark item exists twice inside the evaluation suite itself and only there"
    val df = Seq(
      (100L, inner), (1L, wrapper),
      (2L, "a completely different document about something else entirely with its own words and phrasing throughout"),
      (200L, evalDup), (201L, evalDup))
      .toDF("doc_id", "text")
    val out = TextOps.decontaminate(df, "doc_id", "text",
        col("doc_id") >= 100L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    Caches.clear()
    assert(out.keySet == Set((1L, 100L)), s"${out.keySet}")
    // winnowing guarantee: windows of the eval item inside the wrapper
    // select the same minima → the train doc covers most of the item
    assert(out((1L, 100L)).getAs[Double]("eval_coverage") >= 0.8)
  }

  test("exact dups score containment 1.0 over the capped sets") {
    import spark.implicits._
    val t = "identical content repeated across documents long enough to produce a healthy set of winnowed prints"
    val df = Seq((1L, t), (2L, t),
      (3L, "unrelated filler document with enough length to winnow but nothing shared at all here"))
      .toDF("doc_id", "text")
    val out = TextOps.containmentPairs(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect()
    Caches.clear()
    assert(out.map(r => (r._1, r._2)).toSet == Set((1L, 2L)))
    assert(out.head._4 == 1.0)
  }

  test("winnowFingerprints: row-local selection, short docs select nothing") {
    import spark.implicits._
    val out = Seq(
      Tuple1("a document comfortably longer than the twenty-three character minimum for k=8 w=16"),
      Tuple1("too short"), Tuple1(null: String))
      .toDF("text")
      .select(TextOps.winnowFingerprints(col("text")).as("fp"))
      .as[Array[Long]].collect()
    assert(out(0).nonEmpty && out(0).sorted.sameElements(out(0)) &&
      out(0).distinct.length == out(0).length)
    assert(out(1).isEmpty && out(2).isEmpty)
    // deterministic: same text → same prints
    val again = Seq(Tuple1("a document comfortably longer than the twenty-three character minimum for k=8 w=16"))
      .toDF("text").select(TextOps.winnowFingerprints(col("text")).as("fp"))
      .as[Array[Long]].collect()
    assert(again(0).sameElements(out(0)))
  }

  test("decontaminate: shuffle fallback above the broadcast gate is " +
    "bit-equal and plans no broadcast of the eval index") {
    // the q94 fixture: sf0.001 documents, 4% eval suite
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val isEval = col("doc_id") % 25 === 0
    val viaBroadcast =
      TextOps.decontaminate(docs, "doc_id", "text", isEval).collect().toSeq
    Caches.clear()
    // gate at 0 prints forces the fallback; kill auto-broadcast too or
    // Catalyst would re-broadcast the tiny test side on its own stats
    // and hide the shape under test
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fb = TextOps.decontaminate(docs, "doc_id", "text", isEval,
        maxBroadcastPrints = 0L)
      val p = fb.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastExchange"),
        s"fallback mode still broadcasts:\n$p")
      assert(viaBroadcast.nonEmpty && fb.collect().toSeq == viaBroadcast,
        "fallback result diverged from broadcast result")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      Caches.clear()
    }
  }
}
