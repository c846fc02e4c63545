package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Known-answer tests for the LLM-corpus operators: dedup finds planted
  * duplicates, LSH surfaces near-dups with the right Jaccard, cosine math
  * is exact on constructed vectors, multimodal plumbing keeps its shape.
  */
class LlmOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("exactDedup: planted duplicate collapses to one canonical") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val out = TextOps.exactDedup(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("unicodeNormalizedDedup: precomposed, decomposed+NBSP, and " +
    "zero-width-injected variants collapse to one cluster; ASCII " +
    "singletons stay unchanged") {
    val df = Seq(
      (1L, "caf\u00e9 menu"),            // NFC - the canonical form
      (2L, "cafe\u0301\u00a0menu"),       // NFD + NBSP
      (3L, "caf\u00e9\u200b menu"),       // ZWSP injected
      (4L, "plain ascii")).toDF("doc_id", "text")
    val out = TextOps.unicodeNormalizedDedup(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, false, 3L, 1L), // already canonical, clustered, canon = 1
      (2L, true, 3L, 1L),
      (3L, true, 3L, 1L),
      (4L, false, 1L, 4L)), out.mkString(", "))
  }

  test("stratifiedSample: exact k per stratum, whole stratum when " +
    "smaller, partition-order-invariant") {
    val df = ((0 until 50).map(i => (i.toLong, "big")) ++
      (100 until 103).map(i => (i.toLong, "small")))
      .toDF("doc_id", "lang")
    val out = TextOps.stratifiedSample(df.repartition(7), Seq("lang"),
      "doc_id", 5)
    val byLang = out.collect()
      .groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("sample_rank"))).toSet).toMap
    assert(byLang("big").size == 5)     // exactly k
    assert(byLang("small").size == 3)   // whole stratum when < k
    assert(byLang("big").map(_._2) == Set(1L, 2L, 3L, 4L, 5L))
    // determinism: a different physical partitioning picks the SAME ids
    val again = TextOps.stratifiedSample(df.repartition(3), Seq("lang"),
      "doc_id", 5).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("sample_rank")))
      .toSet
    assert(again == byLang("big") ++ byLang("small"))
    // the rank-<=-k filter must compile to the partial top-k operator
    val plan = TextOps.stratifiedSample(df, Seq("lang"), "doc_id", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"stratifiedSample lost the top-k pushdown:\n$plan")
  }

  test("minhashLsh: identical docs are candidates with jaccard 1.0") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq((1L, text), (2L, text), (3L, "completely different words here that share nothing at all today"))
      .toDF("doc_id", "text")
    val out = TextOps.minhashLsh(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_candidates") == 1L)
    assert(out(1L).getAs[Double]("best_jaccard") == 1.0)
    assert(out(1L).getAs[Long]("best_partner") == 2L)
    assert(out(3L).getAs[Long]("n_candidates") == 0L)
  }

  test("incrementalNearDup: new batch pairs against the standing corpus " +
    "only, never within itself") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    // old corpus: 1 (dup source), 3 (unrelated); new batch: 10 and 11
    // are duplicates of each other AND of old doc 1, 12 is novel. The
    // verdicts must come from the OLD side only: 10 and 11 each match
    // old doc 1 with exactly one candidate (pairing with their new
    // sibling would show n_candidates 2), 12 matches nothing.
    val df = Seq(
      (1L, text), (3L, "completely different words here that share nothing at all today"),
      (10L, text), (11L, text),
      (12L, "a third corpus of words unseen anywhere else in this fixture set"))
      .toDF("doc_id", "text")
    val out = TextOps.incrementalNearDup(df, "doc_id", "text",
        col("doc_id") >= 10L).collect()
      .map(r => r.getLong(0) -> r).toMap
    Caches.clear()
    assert(out.keySet == Set(10L, 11L, 12L)) // only new docs get rows
    for (id <- Seq(10L, 11L)) {
      assert(out(id).getAs[Boolean]("is_dup"), s"$id should dup old doc 1")
      assert(out(id).getAs[Long]("best_match") == 1L,
        s"$id must match the OLD doc, not its new sibling")
      assert(out(id).getAs[Double]("best_jaccard") == 1.0)
      assert(out(id).getAs[Long]("n_candidates") == 1L,
        s"$id must see ONE candidate (old doc 1) — a new-new pair leaked")
    }
    assert(!out(12L).getAs[Boolean]("is_dup"))
    assert(out(12L).getAs[Long]("n_candidates") == 0L)
    assert(out(12L).isNullAt(out(12L).fieldIndex("best_match")))
  }

  test("incrementalExactDedup: known content maps to the old canonical, " +
    "novel content and old-side rows don't surface") {
    val df = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "x y z"), // standing corpus
      (10L, "a b c"),                              // exact re-upload
      (11L, "q r s"))                              // novel
      .toDF("doc_id", "text")
    val out = TextOps.incrementalExactDedup(df, "doc_id", "text",
        col("doc_id") >= 10L).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(10L, 11L))
    assert(out(10L).getAs[Boolean]("is_known"))
    // canonical is the MIN old id holding that content (1, not 2)
    assert(out(10L).getAs[Long]("canonical_id") == 1L)
    assert(!out(11L).getAs[Boolean]("is_known"))
    assert(out(11L).isNullAt(out(11L).fieldIndex("canonical_id")))
  }

  test("repetitionStats: planted spam flagged, varied text passes") {
    val df = Seq(
      (1L, "buy now buy now buy now buy now buy now"), // one 2-gram dominates
      (2L, "each word here appears exactly once in this entirely varied sentence"),
      (3L, "solo"))
      .toDF("doc_id", "text")
    val out = TextOps.repetitionStats(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    Caches.clear()
    val spam = out(1L)
    // 10 tokens, "buy"/"now" 5 each → top word 0.5; 9 bigrams, "buy now"
    // 5 of them → top 2-gram 5/9
    assert(spam.getAs[Double]("top_word_ratio") == 0.5)
    assert(spam.getAs[Double]("dup_word_ratio") == 0.8)
    assert(spam.getAs[Double]("top_2gram_ratio") == math.rint(5.0 / 9 * 1e6) / 1e6)
    assert(spam.getAs[Boolean]("repetitive"))
    val clean = out(2L)
    assert(clean.getAs[Double]("dup_word_ratio") == 0.0)
    assert(!clean.getAs[Boolean]("repetitive"))
    val solo = out(3L) // single token: no bigrams, top word = the word
    assert(solo.getAs[Double]("top_2gram_ratio") == 0.0)
    assert(solo.getAs[Boolean]("repetitive")) // top_word_ratio 1.0
  }

  test("sequencePacking: chunk spans, straddles, and the cross-shard carry") {
    // budget 5, shardSize 2 → docs 0,1 in shard 0 and 2,3 in shard 1;
    // token counts 3,4,6,2 concatenate to spans [0,3) [3,7) [7,13)
    // [13,15) → sequences of 5 tokens: doc1 straddles seqs 0-1, doc2
    // straddles 1-2, doc3 sits inside seq 2. Docs 2,3 only come out
    // right if shard 1 carries shard 0's 7-token total.
    val df = Seq(
      (0L, "a b c", "en"), (1L, "a b c d", "en"),
      (2L, "a b c d e f", "en"), (3L, "a b", "en"),
      (4L, "x y z", "fr")) // second lang: its own zero-based packing
      .toDF("doc_id", "text", "lang")
    val out = TextOps.sequencePacking(df, "doc_id", "text", "lang",
        budget = 5, shardSize = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    Caches.clear()
    def row(id: Long) = {
      val r = out(id)
      (r.getAs[Long]("tok_start"), r.getAs[Long]("seq_start"),
        r.getAs[Long]("seq_end"), r.getAs[Long]("n_seqs"),
        r.getAs[Long]("seq_offset"))
    }
    assert(row(0L) == (0L, 0L, 0L, 1L, 0L))
    assert(row(1L) == (3L, 0L, 1L, 2L, 3L)) // straddles the first cut
    assert(row(2L) == (7L, 1L, 2L, 2L, 2L)) // needs the shard-0 carry
    assert(row(3L) == (13L, 2L, 2L, 1L, 3L))
    assert(row(4L) == (0L, 0L, 0L, 1L, 0L)) // fr restarts at zero
  }

  test("dupClusters: transitive duplicates collapse to the min-id component") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq((1L, text), (2L, text), (5L, text),
      (3L, "completely different words here that share nothing at all today"))
      .toDF("doc_id", "text")
    val out = TextOps.dupClusters(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 3L -> 3L))
  }

  test("dupClusters: CHAIN component propagates past the seed (A~B~C, A!~C)") {
    // B is the middle doc; A diverges from B around position 10, C around
    // position 30 — so A~B and B~C clear the 0.8 Jaccard threshold but
    // A~C (double the distance) does not. With C holding the min id, the
    // seed labels A with B's id and the loop must propagate C's id to A
    // through B — the case the least(self, min(neighbor)) seed alone
    // cannot solve.
    val base = (1 to 50).map(i => s"tok$i").toVector
    def doc(edits: Map[Int, String]) =
      base.zipWithIndex.map { case (w, i) => edits.getOrElse(i, w) }.mkString(" ")
    val b = doc(Map.empty)
    val a = doc(Map(9 -> "ax", 10 -> "ay", 11 -> "az"))
    val c = doc(Map(29 -> "cx", 30 -> "cy", 31 -> "cz"))
    val df = Seq((1L, c), (2L, b), (3L, a)).toDF("doc_id", "text")
    val out = TextOps.dupClusters(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("canonicalPerCluster: longest doc wins its cluster, equal lengths " +
    "tie to min id, singletons always keep") {
    // cluster {1,2,4}: 1/2 identical (50 tokens), 4 is 1 plus two
    // appended tokens (52 tokens, shingle jaccard 48/50 = 0.96 ≥ 0.8);
    // cluster {5,6}: identical texts over a disjoint vocabulary (a
    // LENGTH TIE — min id must keep); 3 is a singleton
    val base = (1 to 50).map(i => s"tok$i").mkString(" ")
    val other = (1 to 40).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, base), (2L, base), (4L, base + " zz1 zz2"),
      (5L, other), (6L, other),
      (3L, "completely different words here that share nothing at all today"))
      .toDF("doc_id", "text")
    val out = TextOps.canonicalPerCluster(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getAs[Long]("n_tokens"), r.getAs[Boolean]("keep")))
      .toMap
    Caches.clear()
    // longest wins {1,2,4}
    assert(out(4L) == (1L, 52L, true))
    assert(!out(1L)._3 && !out(2L)._3)
    // length tie in {5,6} goes to the min id
    assert(out(5L) == (5L, 40L, true) && !out(6L)._3)
    // singleton keeps itself
    assert(out(3L) == (3L, 10L, true))
    // exactly one keeper per component
    assert(out.values.groupBy(_._1).forall(_._2.count(_._3) == 1))
  }

  test("snapshotDiff: added/removed/changed/unchanged verdicts, " +
    "null texts compare unchanged") {
    val old = Seq((1L, "same"), (2L, "was this"), (3L, "gone"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val nw = Seq((1L, "same"), (2L, "now this"), (4L, "fresh"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextOps.snapshotDiff(old, nw, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added", 5L -> "unchanged"))
  }

  test("corpusFilter: first-fail cascade, survivor-only dedup") {
    val sentence = "the quick a brown fox jumps"
    val okText = Seq.fill(6)(sentence).mkString(" ")            // 36 tok, en
    val reordered = Seq.fill(6)("brown fox the quick a jumps").mkString(" ")
    val shortSameVocab = "the quick a brown fox jumps the a quick brown"
    val foreign = Seq.fill(6)("wunderbar ausgezeichnet glorreich herrlich " +
      "prachtvoll vortrefflich").mkString(" ")                  // no stopwords
    val lowQ = Seq.fill(4)("at it we he the go a is").mkString(" ") // avg len 2
    val df = Seq(
      (0L, shortSameVocab), // too_short — and must NOT shadow doc 1's keep
      (1L, okText),         // kept (first surviving fingerprint holder)
      (2L, reordered),      // same vocab as 1 → duplicate
      (3L, "tiny doc here"),// too_short
      (4L, foreign),        // non_english (passes quality: long words)
      (5L, lowQ))           // low_quality (en, but short words)
      .toDF("doc_id", "text")
    val out = TextOps.corpusFilter(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(0L -> "too_short", 1L -> "kept", 2L -> "duplicate",
      3L -> "too_short", 4L -> "non_english", 5L -> "low_quality"))
  }

  test("simhashNearDup: identical docs pair at hamming 0") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq((1L, text), (2L, text),
      (3L, "totally unrelated different vocabulary entirely here now"))
      .toDF("doc_id", "text")
    val out = TextOps.simhashNearDup(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_dups") == 1L)
    assert(out(1L).getAs[Long]("best_partner") == 2L)
    assert(out(1L).getAs[Int]("best_hamming") == 0)
    assert(out(3L).getAs[Long]("n_dups") == 0L)
  }

  test("ngramJaccardBest: known overlap") {
    // shingle sets: A={ "a b c", "b c d" }, B={ "a b c", "b c x" } → J = 1/3
    val df = Seq((1L, "a b c d", "en"), (2L, "a b c x", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextOps.ngramJaccardBest(df, "doc_id", "text", Seq("lang"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSet == Set((1L, 2L, 1.0 / 3), (2L, 1L, 1.0 / 3)))
  }

  test("semanticDupClusters: identical vectors cluster to the min id, " +
    "orthogonal ones stay singletons") {
    // 64-dim so the hyperplane signature (dim=64) sees real vectors;
    // 1 and 7 identical (cosine 1, same bucket), 3 is their negation
    // (opposite bucket — never a candidate), 5 orthogonal-ish
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(i => ((seed * 31 + i * 7) % 13 - 6).toFloat)
    val same = vec(1)
    val df = Seq(
      (1L, same), (7L, same),
      (3L, same.map(-_)),
      (5L, vec(2)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDupClusters(df, "vec_id", "embedding",
        threshold = 0.99).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Caches.clear()
    assert(out(1L) == 1L && out(7L) == 1L, s"$out")
    assert(out(3L) == 3L && out(5L) == 5L, s"$out")
  }

  test("cosine on constructed vectors is exact") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 0),
      (3L, Array(1.0f, 1.0f), 0)).toDF("vec_id", "embedding", "label")
    val out = Similarity.blockedNearestNeighbor(df, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // cos(v1,v3) = 1000*1000 / (1000 * sqrt(2e6)) = 1/sqrt(2)
    val inv = 1000.0 * 1000 / (1000 * math.sqrt(2000000.0))
    assert(out(1L) == (3L, inv))
    assert(out(2L) == (3L, inv))
    assert(out(3L)._2 == inv) // ties → lowest id partner
    assert(out(3L)._1 == 1L)
  }

  test("bruteForceTopK ranks by cosine then id") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.1f), 0),
      (2L, Array(0.9f, 0.1f), 0), (3L, Array(-1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.bruteForceTopK(df, "vec_id", "embedding",
      col("vec_id") === 0, 2)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(out.length == 2 && out.head._1 == 1)
    assert(out.map(_._2).toSet.subsetOf(Set(1L, 2L)))
  }

  test("hardNegatives: same-label vectors never mined, nearest " +
    "cross-label wins, k bounds the list") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f), 0),   // probe, label 0
      (1L, Array(1.0f, 0.05f), 0),  // nearest overall — but same label
      (2L, Array(0.9f, 0.2f), 1),   // nearest cross-label
      (3L, Array(0.5f, 0.5f), 1),
      (4L, Array(-1.0f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(df, "vec_id", "embedding",
      "label", col("vec_id") === 0, 2).collect()
    assert(out.length == 2)
    // the same-label near-twin is excluded, rank 1 is the cross-label
    // neighbor, and ranks order by cosine
    assert(!out.map(_.getAs[Long]("negative_id")).contains(1L))
    assert(out.head.getAs[Long]("negative_id") == 2L)
    assert(out.head.getAs[Long]("rank") == 1L)
    assert(out(1).getAs[Long]("negative_id") == 3L)
    assert(out.forall(_.getAs[Int]("neg_label") != 0))
  }

  test("recallAtK: identical frames → 1.0, disjoint frames → 0.0") {
    val exact = Seq((0L, 1L), (0L, 2L), (0L, 3L), (50L, 4L), (50L, 5L), (50L, 6L))
      .toDF("probe_id", "neighbor_id")
    val perfect = Similarity.recallAtK(exact, exact, 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(perfect == Map(0L -> (3L, 1.0), 50L -> (3L, 1.0)))
    val disjoint = Seq((0L, 9L), (50L, 8L)).toDF("probe_id", "neighbor_id")
    val zero = Similarity.recallAtK(exact, disjoint, 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(zero == Map(0L -> (0L, 0.0), 50L -> (0L, 0.0)))
    // partial overlap → 2/3
    val partial = Seq((0L, 1L), (0L, 2L), (0L, 9L), (50L, 7L), (50L, 8L), (50L, 9L))
      .toDF("probe_id", "neighbor_id")
    val twoThirds = Similarity.recallAtK(exact, partial, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twoThirds == Map(0L -> 2L, 50L -> 0L))
  }

  test("ivfTopK prebuilt: parquet round-trip equals inline build; search plan has no centroid aggregate") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    val probe = col("vec_id") % 50 === 0
    val inline = Similarity.ivfTopK(emb, "vec_id", "embedding", "label",
      probe, 3, nprobe = 2)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf")
      .toString + "/idx"
    Similarity.buildIvf(emb, "vec_id", "embedding", "label", path)
    val pre = Similarity.ivfTopK(emb, "vec_id", "embedding", "label",
      probe, 3, nprobe = 2, prebuilt = Some(spark.read.parquet(path)))
    // the build/search split's whole point: searching a prebuilt index
    // never re-aggregates the corpus into centroids — the search plan is
    // aggregate-free, while the inline fallback plainly is not
    val prePlan = pre.queryExecution.optimizedPlan.toString
    assert(!prePlan.contains("Aggregate"), s"search plan aggregates:\n$prePlan")
    assert(inline.queryExecution.optimizedPlan.toString.contains("Aggregate"))
    assert(pre.collect().toSet == inline.collect().toSet)
  }

  test("q43/q68 search via the prebuilt IVF index: no aggregation in the query plan") {
    for (q <- Seq(LlmQueries.q43AnnIvf _, LlmQueries.q68AnnIvf2 _)) {
      val df = q(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("Aggregate"), s"query plan aggregates:\n$plan")
      assert(df.count() > 0)
    }
  }

  test("q72: widening nprobe never hurts recall (testdata)") {
    val out = LlmQueries.q72AnnRecall(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (h1, h2) = (r.getAs[Long]("hits_np1"), r.getAs[Long]("hits_np2"))
      assert(h2 >= h1, s"probe ${r.getLong(0)}: nprobe=2 recall dropped")
      assert(h1 >= 0 && h2 <= 3)
    }
  }

  test("dedupRecall: planted dups → both methods find them; distinct docs don't pair") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val odd = "an entirely separate duplicated sentence planted in the odd stratum here"
    val df = Seq((2L, text), (4L, text), (6L, text),
      (3L, odd), (5L, odd),
      (8L, "completely different words here that share nothing at all today"))
      .toDF("doc_id", "text")
    val out = TextOps.dedupRecall(df, "doc_id", "text").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("minhash_lsh", "simhash",
      "pool_audit_even", "pool_audit_odd"))
    // 3 identical even docs → 3 exact pairs, plus the odd planted pair;
    // identical docs collide in every band (minhash) and at hamming 0
    // (simhash) → perfect recall
    for (m <- Seq("minhash_lsh", "simhash")) {
      assert(out(m).getAs[Long]("n_exact") == 4L)
      assert(out(m).getAs[Long]("n_hits") == 4L)
      assert(out(m).getAs[Double]("recall") == 1.0)
    }
    // minhash candidates on this corpus are exactly the true pairs
    assert(out("minhash_lsh").getAs[Long]("n_candidates") == 4L)
    assert(out("minhash_lsh").getAs[Double]("precision") == 1.0)
    // the two audit strata are independent replicates over DISJOINT doc
    // sets: each sees only its own stratum's truth (pairs never cross
    // strata) and both report zero pool misses
    assert(out("pool_audit_even").getAs[Long]("n_exact") == 3L)
    assert(out("pool_audit_even").getAs[Long]("n_hits") == 3L)
    assert(out("pool_audit_even").getAs[Double]("recall") == 1.0)
    assert(out("pool_audit_odd").getAs[Long]("n_exact") == 1L)
    assert(out("pool_audit_odd").getAs[Long]("n_hits") == 1L)
    assert(out("pool_audit_odd").getAs[Double]("recall") == 1.0)
  }

  test("simhashDupClusters: identical docs collapse to the min-id component") {
    val t = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq((5L, t), (2L, t), (9L, t),
      (7L, "completely different words that share nothing with the fox sentence at all"))
      .toDF("doc_id", "text")
    val out = TextOps.simhashDupClusters(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // identical docs have hamming 0 → one component at the min id;
    // the distinct doc is a singleton keeping its own id
    assert(out == Map(2L -> 2L, 5L -> 2L, 9L -> 2L, 7L -> 7L))
    Caches.clear()
  }

  test("simhash is stable and respects content") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "totally other words")).toDF("doc_id", "text")
    val out = TextOps.simhashDf(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
    assert(out(1L) >= 0 && out(1L) < (1L << 28))
  }

  test("multimodal plumbing: schema, meta, frame sampling") {
    val docs = Seq((0L, "0123456789abcdefghij"), (1L, "short")).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs)
    assert(media.schema.fieldNames.toSeq == Seq("doc_id", "media_type", "content"))
    val meta = Multimodal.withMeta(media).collect().map(r =>
      r.getAs[Long]("doc_id") -> r).toMap
    assert(meta(0L).getAs[Int]("n_bytes") == 20)
    assert(meta(0L).getAs[String]("media_type") == "image")
    assert(meta(1L).getAs[String]("media_type") == "audio")
    val frames = Multimodal.sampleFrames(media, stride = 1)
      .filter(col("doc_id") === 0).count()
    assert(frames == 2) // 20 bytes → 2 fake frames at stride 1
  }

  test("decodeWavHeader parses real RIFF/WAVE headers; withWavMeta types the rows") {
    def wavBytes(channels: Int, rate: Int, bits: Int, dataLen: Int,
                 listChunk: Boolean = false,
                 includePayload: Boolean = true): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(128 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
      val byteRate = rate * channels * bits / 8
      tag("RIFF"); bb.putInt(36 + dataLen); tag("WAVE")
      if (listChunk) { tag("LIST"); bb.putInt(4); bb.putInt(0) }
      tag("fmt "); bb.putInt(16)
      bb.putShort(1); bb.putShort(channels.toShort); bb.putInt(rate)
      bb.putInt(byteRate); bb.putShort((channels * bits / 8).toShort)
      bb.putShort(bits.toShort)
      tag("data"); bb.putInt(dataLen)
      if (includePayload) bb.put(new Array[Byte](dataLen))
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    // golden: mono 16-bit 8 kHz, 3200 data bytes → byteRate 16000, 0.2 s
    val golden = Multimodal.decodeWavHeader(wavBytes(1, 8000, 16, 3200)).get
    assert(golden == Multimodal.WavMeta(1, 8000, 16, 3200L, 0.2))
    // chunk walk: an unknown LIST chunk before fmt/data is skipped by size
    assert(Multimodal.decodeWavHeader(
      wavBytes(2, 44100, 24, 1764, listChunk = true)).contains(
      Multimodal.WavMeta(2, 44100, 24, 1764L, 1764.0 / (44100 * 2 * 3))))
    // header PREFIX: declared data size without the payload still decodes
    // (the 100 TB range-request read path)
    assert(Multimodal.decodeWavHeader(
      wavBytes(1, 8000, 16, 3200, includePayload = false))
      .contains(golden))
    // malformed inputs are None, never exceptions
    assert(Multimodal.decodeWavHeader(null).isEmpty)
    assert(Multimodal.decodeWavHeader("not a wav at all".getBytes).isEmpty)
    assert(Multimodal.decodeWavHeader(
      wavBytes(1, 8000, 16, 3200).take(20)).isEmpty)
    // adversarial: a chunk declaring a ~2^32 size ends the walk as None —
    // it must never wrap the offset negative and throw (r9 ADVICE)
    val huge = java.nio.ByteBuffer.allocate(40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    huge.put("RIFF".getBytes("US-ASCII")); huge.putInt(32)
    huge.put("WAVE".getBytes("US-ASCII"))
    huge.put("JUNK".getBytes("US-ASCII")); huge.putInt(0xFFFFFFF0)
    assert(Multimodal.decodeWavHeader(huge.array()).isEmpty)
    // column form: audio rows decode, others stay null, bad audio is null
    val rows = spark.sparkContext.parallelize(Seq(
      org.apache.spark.sql.Row(0L, "audio", wavBytes(1, 8000, 16, 3200)),
      org.apache.spark.sql.Row(1L, "image", wavBytes(1, 8000, 16, 3200)),
      org.apache.spark.sql.Row(2L, "audio", "garbage".getBytes)))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val out = Multimodal.withWavMeta(media).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[org.apache.spark.sql.Row]("wav"))).toMap
    assert(out(0L).exists(w => w.getAs[Int]("sample_rate") == 8000 &&
      w.getAs[Double]("duration_sec") == 0.2))
    assert(out(1L).isEmpty)
    assert(out(2L).isEmpty)
  }

  test("decodePng/BmpHeader parse real headers; withImgMeta types the rows") {
    def pngBytes(w: Int, h: Int, depth: Int, colorType: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(40) // big-endian by default
      bb.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
      bb.putInt(13); bb.put("IHDR".getBytes("US-ASCII"))
      bb.putInt(w); bb.putInt(h); bb.put(depth.toByte)
      bb.put(colorType.toByte); bb.put(0.toByte); bb.put(0.toByte)
      bb.put(0.toByte)
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    def bmpBytes(w: Int, h: Int, bpp: Int, dib: Int = 40): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("BM".getBytes("US-ASCII")); bb.putInt(62); bb.putInt(0)
      bb.putInt(54); bb.putInt(dib)
      if (dib == 12) {
        bb.putShort(w.toShort); bb.putShort(h.toShort)
        bb.putShort(1); bb.putShort(bpp.toShort)
      } else {
        bb.putInt(w); bb.putInt(h); bb.putShort(1); bb.putShort(bpp.toShort)
      }
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    // golden PNG: 8-bit RGBA 640×480 → 32 bits per pixel
    assert(Multimodal.decodePngHeader(pngBytes(640, 480, 8, 6))
      .contains(Multimodal.ImgMeta("png", 640, 480, 32)))
    // grayscale 16-bit; palette 4-bit
    assert(Multimodal.decodePngHeader(pngBytes(10, 20, 16, 0))
      .contains(Multimodal.ImgMeta("png", 10, 20, 16)))
    assert(Multimodal.decodePngHeader(pngBytes(10, 20, 4, 3))
      .contains(Multimodal.ImgMeta("png", 10, 20, 4)))
    // golden BMPs: the common 40-byte DIB and the ancient 12-byte core
    // header (16-bit fields); negative height = top-down rows
    assert(Multimodal.decodeBmpHeader(bmpBytes(800, 600, 24))
      .contains(Multimodal.ImgMeta("bmp", 800, 600, 24)))
    assert(Multimodal.decodeBmpHeader(bmpBytes(31, 17, 8, dib = 12))
      .contains(Multimodal.ImgMeta("bmp", 31, 17, 8)))
    assert(Multimodal.decodeBmpHeader(bmpBytes(800, -600, 32))
      .contains(Multimodal.ImgMeta("bmp", 800, 600, 32)))
    // the sniffing one-call form routes by container
    assert(Multimodal.decodeImageHeader(pngBytes(2, 2, 8, 2))
      .exists(_.format == "png"))
    assert(Multimodal.decodeImageHeader(bmpBytes(2, 2, 1))
      .exists(_.format == "bmp"))
    // malformed inputs are None, never exceptions
    assert(Multimodal.decodeImageHeader(null).isEmpty)
    assert(Multimodal.decodeImageHeader("not an image".getBytes).isEmpty)
    assert(Multimodal.decodePngHeader(pngBytes(640, 480, 8, 6).take(20))
      .isEmpty)
    assert(Multimodal.decodePngHeader(pngBytes(640, 480, 3, 6)).isEmpty)
    assert(Multimodal.decodePngHeader(pngBytes(0, 480, 8, 6)).isEmpty)
    assert(Multimodal.decodePngHeader(pngBytes(1 << 21, 4, 8, 6)).isEmpty)
    // "BM"-prefixed TEXT must not spoof: printable DIB-size bytes read
    // ≥ 0x20202020, outside the published layout set
    assert(Multimodal.decodeBmpHeader(
      "BM text that merely starts with the magic".getBytes).isEmpty)
    assert(Multimodal.decodeBmpHeader(bmpBytes(800, 600, 24, dib = 39))
      .isEmpty)
    assert(Multimodal.decodeBmpHeader(bmpBytes(800, 600, 13)).isEmpty)
    // column form: image rows decode, others stay null, bad images null
    val rows = spark.sparkContext.parallelize(Seq(
      org.apache.spark.sql.Row(0L, "image", pngBytes(640, 480, 8, 6)),
      org.apache.spark.sql.Row(1L, "audio", pngBytes(640, 480, 8, 6)),
      org.apache.spark.sql.Row(2L, "image", "garbage".getBytes)))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val out = Multimodal.withImgMeta(media).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[org.apache.spark.sql.Row]("img"))).toMap
    assert(out(0L).exists(i => i.getAs[String]("format") == "png" &&
      i.getAs[Int]("width") == 640 && i.getAs[Int]("bits_per_pixel") == 32))
    assert(out(1L).isEmpty)
    assert(out(2L).isEmpty)
  }

  test("decodeJpegHeader: golden baseline/progressive/EXIF-first headers, " +
    "truncation and spoof rejects") {
    import Multimodal.JpegMeta
    def jpegBytes(w: Int, h: Int, sof: Int = 0xC0, jfif: Boolean = true,
                  exifFirst: Boolean = false, fill: Boolean = false,
                  ncomp: Int = 3, precision: Int = 8,
                  xd: Int = 72, yd: Int = 96): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(128) // big-endian by default
      bb.putShort(0xFFD8.toShort) // SOI
      if (exifFirst) { // APP1 Exif — the camera-written first segment
        bb.putShort(0xFFE1.toShort); bb.putShort(18)
        bb.put("Exif".getBytes("US-ASCII")); bb.put(0.toByte)
        bb.put(0.toByte); bb.put(new Array[Byte](10))
      }
      if (jfif) { // APP0 JFIF with the density triple (unit 1 = dpi)
        bb.putShort(0xFFE0.toShort); bb.putShort(16)
        bb.put("JFIF".getBytes("US-ASCII")); bb.put(0.toByte)
        bb.put(1.toByte); bb.put(1.toByte); bb.put(1.toByte)
        bb.putShort(xd.toShort); bb.putShort(yd.toShort)
        bb.putShort(0)
      }
      if (fill) bb.put(0xFF.toByte) // marker fill byte before the SOF
      bb.put(0xFF.toByte); bb.put(sof.toByte)
      bb.putShort((8 + 3 * ncomp).toShort)
      bb.put(precision.toByte); bb.putShort(h.toShort); bb.putShort(w.toShort)
      bb.put(ncomp.toByte)
      for (c <- 1 to ncomp) {
        bb.put(c.toByte); bb.put(0x11.toByte); bb.put(0.toByte)
      }
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    // golden baseline: JFIF, 3-component YCbCr, 8-bit → 24 bpp + density
    assert(Multimodal.decodeJpegHeader(jpegBytes(640, 480)).contains(
      JpegMeta("jpeg", 640, 480, 24, Some(1), Some(72), Some(96))))
    // progressive (SOF2) labels distinctly, same dimension layout
    assert(Multimodal.decodeJpegHeader(jpegBytes(31, 17, sof = 0xC2))
      .contains(JpegMeta("jpeg_prog", 31, 17, 24, Some(1), Some(72),
        Some(96))))
    // EXIF-first with NO JFIF: the walker skips APP1 by length; density
    // is null (no JFIF segment carries it)
    assert(Multimodal.decodeJpegHeader(
      jpegBytes(800, 600, jfif = false, exifFirst = true)).contains(
      JpegMeta("jpeg", 800, 600, 24, None, None, None)))
    // EXIF first AND JFIF present — density still found
    assert(Multimodal.decodeJpegHeader(
      jpegBytes(800, 600, exifFirst = true, xd = 300, yd = 300)).contains(
      JpegMeta("jpeg", 800, 600, 24, Some(1), Some(300), Some(300))))
    // marker fill bytes before the SOF are legal padding
    assert(Multimodal.decodeJpegHeader(jpegBytes(12, 34, fill = true))
      .exists(m => m.width == 12 && m.height == 34))
    // grayscale single component; extended 12-bit precision
    assert(Multimodal.decodeJpegHeader(jpegBytes(10, 20, ncomp = 1))
      .exists(_.bits_per_pixel == 8))
    assert(Multimodal.decodeJpegHeader(
      jpegBytes(10, 20, sof = 0xC1, precision = 12))
      .exists(m => m.format == "jpeg" && m.bits_per_pixel == 36))
    // rejects: truncation, DNL-deferred height 0, bad component count /
    // precision, text (0xFFD8 is not ASCII-spoofable), null
    assert(Multimodal.decodeJpegHeader(jpegBytes(640, 480).take(10)).isEmpty)
    assert(Multimodal.decodeJpegHeader(jpegBytes(640, 0)).isEmpty)
    assert(Multimodal.decodeJpegHeader(jpegBytes(640, 480, ncomp = 5)).isEmpty)
    assert(Multimodal.decodeJpegHeader(
      jpegBytes(640, 480, precision = 7)).isEmpty)
    assert(Multimodal.decodeJpegHeader("plain text payload".getBytes).isEmpty)
    assert(Multimodal.decodeJpegHeader(null).isEmpty)
    // the sniffing one-call form now routes JPEG too
    assert(Multimodal.decodeImageHeader(jpegBytes(2, 2)).contains(
      Multimodal.ImgMeta("jpeg", 2, 2, 24)))
  }

  test("decodeMp4Header walks ISO BMFF boxes; withVideoMeta types the rows") {
    def mp4Bytes(version: Int, timescale: Int, duration: Long,
                 brand: String = "isom"): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(160) // big-endian by default
      bb.putInt(16); bb.put("ftyp".getBytes("US-ASCII"))
      bb.put(brand.getBytes("US-ASCII")); bb.putInt(0)
      // free box between ftyp and moov: the walk must skip by size
      bb.putInt(12); bb.put("free".getBytes("US-ASCII")); bb.putInt(0)
      val mvhdPayload = if (version == 0) 4 + 4 + 4 + 4 + 4 else 4 + 8 + 8 + 4 + 8
      val mvhdSize = 8 + mvhdPayload
      bb.putInt(8 + mvhdSize); bb.put("moov".getBytes("US-ASCII"))
      bb.putInt(mvhdSize); bb.put("mvhd".getBytes("US-ASCII"))
      bb.putInt(version << 24) // version + flags
      if (version == 0) {
        bb.putInt(0); bb.putInt(0) // ctime, mtime
        bb.putInt(timescale); bb.putInt(duration.toInt)
      } else {
        bb.putLong(0L); bb.putLong(0L)
        bb.putInt(timescale); bb.putLong(duration)
      }
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    // golden v0: 90 kHz timescale, 45 000 units = 0.5 s
    assert(Multimodal.decodeMp4Header(mp4Bytes(0, 90000, 45000))
      .contains(Multimodal.VideoMeta("mp4", "isom", 90000, 45000, 0.5)))
    // v1 (64-bit times) layout
    assert(Multimodal.decodeMp4Header(mp4Bytes(1, 1000, 2500, "mp42"))
      .contains(Multimodal.VideoMeta("mp4", "mp42", 1000, 2500, 2.5)))
    // malformed inputs are None, never exceptions
    assert(Multimodal.decodeMp4Header(null).isEmpty)
    assert(Multimodal.decodeMp4Header("plain ascii text payload".getBytes)
      .isEmpty)
    assert(Multimodal.decodeMp4Header(mp4Bytes(0, 90000, 45000).take(30))
      .isEmpty)
    assert(Multimodal.decodeMp4Header(mp4Bytes(0, 0, 45000)).isEmpty)
    assert(Multimodal.decodeMp4Header(mp4Bytes(2, 90000, 45000)).isEmpty)
    // column form: video rows decode, others stay null, bad video null
    val rows = spark.sparkContext.parallelize(Seq(
      org.apache.spark.sql.Row(0L, "video", mp4Bytes(0, 90000, 45000)),
      org.apache.spark.sql.Row(1L, "image", mp4Bytes(0, 90000, 45000)),
      org.apache.spark.sql.Row(2L, "video", "garbage".getBytes)))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val out = Multimodal.withVideoMeta(media).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[org.apache.spark.sql.Row]("vid"))).toMap
    assert(out(0L).exists(v => v.getAs[String]("major_brand") == "isom" &&
      v.getAs[Long]("duration_units") == 45000L &&
      v.getAs[Double]("duration_s") == 0.5))
    assert(out(1L).isEmpty)
    assert(out(2L).isEmpty)
  }

  test("decodePartitioned: sentinel stats estimate falls back to parallelism") {
    // An RDD-backed frame has no real size statistics: Spark reports
    // spark.sql.defaultSizeInBytes (Long.MaxValue). The byte-budget sizing
    // must treat that as unknown, not schedule ~1M tasks on 2 rows.
    val rows = spark.sparkContext.parallelize(Seq(
      org.apache.spark.sql.Row(0L, "image", "x".getBytes),
      org.apache.spark.sql.Row(1L, "audio", "y".getBytes)))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    assert(media.queryExecution.optimizedPlan.stats.sizeInBytes >=
      BigInt(spark.sessionState.conf.defaultSizeInBytes))
    val out = Multimodal.decodePartitioned(media)
    val parts = out.rdd.getNumPartitions
    assert(parts == spark.sparkContext.defaultParallelism)
    assert(out.count() == 2)
    // a projection over the stats-less frame can SCALE the sentinel to a
    // value below Long.MaxValue that is still garbage — the sizing must
    // treat any implausible estimate (≥ 1 PiB ceiling) as unknown, not
    // just the exact sentinel
    val pruned = media.select("doc_id", "media_type")
      .withColumn("content", lit(Array[Byte](1, 2)))
    val est = pruned.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(est >= BigInt(1L << 50)) // implausible either way → fallback
    val out2 = Multimodal.decodePartitioned(pruned)
    assert(out2.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }

  test("pqRecall: block-constant vectors reconstruct exactly (their own " +
    "codebook entry), cross-block content keeps nonzero error, agree holds") {
    import spark.implicits._
    // blocks of identical vectors: the per-block floor-mean codebook
    // entry IS the vector, so every subspace assigns to its own block's
    // entry and reconstruction is exact
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(i => ((seed * 31 + i * 7) % 200 - 100) / 100.0f)
    val rows = Seq(
      (1L, 0, vec(1)), (2L, 0, vec(1)), (3L, 0, vec(1)),
      (4L, 1, vec(9)), (5L, 1, vec(9)),
      // block 2 is MIXED: its floor-mean matches neither member, so
      // reconstruction error must be nonzero for both
      (6L, 2, vec(3)), (7L, 2, vec(17)))
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.pqRecall(rows, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), Option(r.get(5)).map(_.toString.toLong),
          r.getBoolean(7))).toMap
    for (id <- Seq(1L, 2L, 3L, 4L, 5L))
      assert(out(id)._1 == 0L, s"block-constant vec $id not exact: $out")
    assert(out(6L)._1 > 0L && out(7L)._1 > 0L,
      "mixed block must carry reconstruction error")
    // identical vectors tie at cosine 1.0 under both precisions → the
    // min-id partner wins in both rankings → agree everywhere
    assert(out.values.forall(_._3), s"agreement broke: $out")
    assert(out(2L)._2.contains(1L)) // min-id tie-break, both precisions
    Caches.clear()
  }

  test("decodeWavSamples goldens: sign extension, prefix decode, " +
    "non-PCM rejection") {
    def wav(samples: Seq[Int], fmt: Int = 1, bits: Int = 16,
            declaredData: Option[Int] = None): Array[Byte] = {
      val dataBytes = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII"))
      bb.putInt(36 + declaredData.getOrElse(dataBytes))
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
      bb.putShort(fmt.toShort); bb.putShort(1); bb.putInt(8000)
      bb.putInt(16000); bb.putShort(2); bb.putShort(bits.toShort)
      bb.put("data".getBytes("US-ASCII"))
      bb.putInt(declaredData.getOrElse(dataBytes))
      samples.foreach(s => bb.putShort(s.toShort))
      bb.array()
    }
    // sign extension: negative int16s decode exactly
    val s = Seq(0, 1, -1, 32767, -32768, 1000, -1000)
    assert(Multimodal.decodeWavSamples(wav(s)).map(_.toSeq).contains(s))
    // header-prefix posture: a data chunk DECLARING more bytes than the
    // buffer holds decodes the complete samples present
    assert(Multimodal.decodeWavSamples(
      wav(s, declaredData = Some(10000))).map(_.toSeq).contains(s))
    // non-PCM format and non-16-bit widths reject (no silent garbage)
    assert(Multimodal.decodeWavSamples(wav(s, fmt = 3)).isEmpty)
    assert(Multimodal.decodeWavSamples(wav(s, bits = 8)).isEmpty)
    // malformed inputs: None, never exceptions
    assert(Multimodal.decodeWavSamples(null).isEmpty)
    assert(Multimodal.decodeWavSamples("RIFFnope".getBytes).isEmpty)
    assert(Multimodal.decodeWavSamples(wav(s).take(30)).isEmpty)
  }

  test("embeddingDrift: identical slices score 1.0, opposed slices " +
    "score -1.0, one-sided blocks are dropped") {
    import spark.implicits._
    def vec(seed: Int, sign: Int): Array[Float] =
      Array.tabulate(64)(i => sign * ((seed * 13 + i * 7) % 100 + 1) / 100.0f)
    val rows = Seq(
      // block 0: both slices identical direction → drift 1.0
      (0L, 0, vec(1, 1)), (1L, 0, vec(1, 1)),
      (2L, 0, vec(1, 1)), (3L, 0, vec(1, 1)),
      // block 1: new slice NEGATED → drift -1.0 (max rotation)
      (10L, 1, vec(5, 1)), (11L, 1, vec(5, -1)),
      // block 2: only old-side rows → dropped (no 0/0 cosine)
      (20L, 2, vec(9, 1)), (22L, 2, vec(9, 1)))
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.embeddingDrift(rows, "vec_id", "embedding",
      "label", col("vec_id") % 2 === 1)
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(out(0) == 1.0, s"identical slices must score 1.0: $out")
    assert(out(1) == -1.0, s"negated slice must score -1.0: $out")
    assert(!out.contains(2), s"one-sided block must be dropped: $out")
    Caches.clear()
  }

  test("decodeAviMjpeg goldens: frame walk, declared count, " +
    "undecodable-frame gap, malformed rejection") {
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(23) // SOI + SOF0 only
      bb.putShort(0xFFD8.toShort)
      bb.putShort(0xFFC0.toShort); bb.putShort(17); bb.put(8.toByte)
      bb.putShort(h.toShort); bb.putShort(w.toShort)
      bb.put(3.toByte)
      bb.put(Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
      bb.array()
    }
    def avi(declared: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      val chunks = frames.map { f =>
        val padded = if (f.length % 2 == 1) f :+ 0.toByte else f
        val bb = java.nio.ByteBuffer.allocate(8 + padded.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("00dc".getBytes("US-ASCII")); bb.putInt(f.length)
        bb.put(padded); bb.array()
      }
      val moviLen = 4 + chunks.map(_.length).sum
      val bb = java.nio.ByteBuffer
        .allocate(12 + 76 + 8 + moviLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII"))
      bb.putInt(4 + 76 + 8 + moviLen)
      bb.put("AVI ".getBytes("US-ASCII"))
      bb.put("LIST".getBytes("US-ASCII")); bb.putInt(68)
      bb.put("hdrl".getBytes("US-ASCII"))
      bb.put("avih".getBytes("US-ASCII")); bb.putInt(56)
      bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
      bb.putInt(declared); (0 until 36).foreach(_ => bb.put(0.toByte))
      bb.put("LIST".getBytes("US-ASCII")); bb.putInt(moviLen)
      bb.put("movi".getBytes("US-ASCII"))
      chunks.foreach(bb.put)
      bb.array()
    }
    // two clean frames: idx 0/1, dims as declared in their SOFs
    val m = Multimodal.decodeAviMjpeg(
      avi(2, Seq(jpeg(320, 240), jpeg(640, 480)))).get
    assert(m.declared_frames == 2)
    assert(m.frames.map(f => (f.idx, f.width, f.height)) ==
      Seq((0, 320, 240), (1, 640, 480)))
    // an undecodable middle frame leaves a GAP, not a renumbering —
    // and declared (3) vs decoded (2) is exactly what a gate compares
    val g = Multimodal.decodeAviMjpeg(
      avi(3, Seq(jpeg(10, 10), "junk frame".getBytes, jpeg(20, 30)))).get
    assert(g.declared_frames == 3)
    assert(g.frames.map(_.idx) == Seq(0, 2))
    // malformed containers: None, never exceptions
    assert(Multimodal.decodeAviMjpeg(null).isEmpty)
    assert(Multimodal.decodeAviMjpeg("RIFF but not avi".getBytes).isEmpty)
    // a WAV is RIFF but not 'AVI ' — must reject at the form gate
    assert(Multimodal.decodeAviMjpeg(
      avi(1, Seq(jpeg(2, 2))).patch(8, "WAVE".getBytes, 4)).isEmpty)
  }

  test("audioPhash32: amplitude invariance, frame sensitivity, " +
    "sub-frame rejection") {
    val base = Array.tabulate(99)(i => ((i * i * 7 + i * 13) % 1999) - 999)
    val h = Multimodal.audioPhash32(base).get
    // uniform amplitude scaling preserves every energy comparison —
    // the invariance a perceptual audio print exists for (×2 here;
    // a volume-normalized re-encode is the production case)
    assert(Multimodal.audioPhash32(base.map(_ * 2)).contains(h))
    assert(Multimodal.audioPhash32(base.map(_ * -1)).contains(h)) // phase
    // zeroing ONLY frame 0 (99/33 = 3 samples) can flip only bit 0
    val z = base.clone(); (0 until 3).foreach(z(_) = 0)
    val hz = Multimodal.audioPhash32(z).get
    assert(java.lang.Long.bitCount(h ^ hz) <= 1)
    // a reordered waveform scrambles the energies → far print
    val rev = base.reverse
    assert(java.lang.Long.bitCount(
      h ^ Multimodal.audioPhash32(rev).get) > 3)
    // fewer samples than frames cannot carry a print
    assert(Multimodal.audioPhash32(Array.fill(20)(5)).isEmpty)
    assert(Multimodal.audioPhash32(null).isEmpty)
  }

  test("pqAdcTopK: block-constant corpus reconstructs exactly, so ADC " +
    "search equals the exact baseline (recall 1.0)") {
    import spark.implicits._
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(i => ((seed * 37 + i * 11) % 200 - 100) / 100.0f)
    // every block constant → PQ reconstruction is exact → ADC ranking
    // must equal brute force for every probe
    val rows = (0 until 4).flatMap(b =>
      (0 until 3).map(i => ((b * 3 + i).toLong, b, vec(b * 7 + 1))))
      .toDF("vec_id", "label", "embedding")
    val probe = col("vec_id") % 3 === 0
    val exact = Similarity.bruteForceTopK(rows, "vec_id", "embedding",
      probe, 2)
    val adc = Similarity.pqAdcTopK(rows, "vec_id", "embedding", "label",
      probe, 2)
    val rec = Similarity.recallAtK(exact, adc, 2).collect()
    assert(rec.nonEmpty && rec.forall(_.getDouble(2) == 1.0),
      s"exact-reconstruction ADC must have recall 1.0: ${rec.toSeq}")
    Caches.clear()
  }

  test("decodeBmpGray + dHash64 goldens: pixel exactness both storage " +
    "orders, brightness/upscale invariance, distinct images differ") {
    def bmp(pixels: Array[Array[Int]], topDown: Boolean = false)
        : Array[Byte] = {
      val h = pixels.length; val w = pixels(0).length
      val rowBytes = ((w * 3 + 3) / 4) * 4
      val size = 54 + rowBytes * h
      val bb = java.nio.ByteBuffer.allocate(size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("BM".getBytes("US-ASCII")); bb.putInt(size); bb.putInt(0)
      bb.putInt(54); bb.putInt(40); bb.putInt(w)
      bb.putInt(if (topDown) -h else h)
      bb.putShort(1); bb.putShort(24); bb.putInt(0); bb.putInt(rowBytes * h)
      bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
      for (s <- 0 until h) {
        val r = if (topDown) s else h - 1 - s
        for (c <- 0 until w) {
          val p = pixels(r)(c).toByte; bb.put(p); bb.put(p); bb.put(p)
        }
        for (_ <- w * 3 until rowBytes) bb.put(0.toByte)
      }
      bb.array()
    }
    // values ≤ 240 so the +10 brightness twin never clips
    val px = Array.tabulate(8, 9)((r, c) => ((r * 29 + c * 53) * (r + c + 2)) % 240)
    def rows(m: Array[Array[Int]]) = m.map(_.toSeq).toSeq
    // pixel exactness: bottom-up (default) and top-down storage decode
    // to the SAME image — the row-flip and 4-byte padding are right
    assert(Multimodal.decodeBmpGray(bmp(px)).map(rows).contains(rows(px)))
    assert(Multimodal.decodeBmpGray(bmp(px, topDown = true)).map(rows)
      .contains(rows(px)))
    val hBase = Multimodal.bmpDHash(bmp(px)).get
    // perceptual invariance 1: uniform brightness shift preserves every
    // adjacent-cell comparison → identical hash (exact dedup would miss
    // this twin — its bytes differ everywhere)
    val bright = px.map(_.map(_ + 10))
    assert(Multimodal.bmpDHash(bmp(bright)).contains(hBase))
    // perceptual invariance 2: a 2× block-constant upscale box-averages
    // back to the same 9×8 grid → identical hash (the "resized twin")
    val up = Array.tabulate(16, 18)((r, c) => px(r / 2)(c / 2))
    assert(Multimodal.bmpDHash(bmp(up)).contains(hBase))
    // distinct content hashes far apart — no false near-dup
    val other = Array.tabulate(8, 9)((r, c) => ((r * 13 + c * 7) * (r * c + 3)) % 240)
    val hOther = Multimodal.bmpDHash(bmp(other)).get
    assert(java.lang.Long.bitCount(hBase ^ hOther) > 3,
      s"distinct fixtures landed within hamming 3: $hBase vs $hOther")
    // undecodable payloads: None, never exceptions
    assert(Multimodal.bmpDHash(null).isEmpty)
    assert(Multimodal.bmpDHash(bmp(px).take(60)).isEmpty) // truncated pixels
    assert(Multimodal.bmpDHash("BM nope".getBytes).isEmpty)
    // sub-grid images cannot carry a 9×8 hash
    assert(Multimodal.dHash64(Array.tabulate(4, 4)((_, _) => 1)).isEmpty)
  }

  test("mulawExpand goldens + format-7 WAV decode end-to-end") {
    // published G.711 values: full-scale endpoints, digital silence,
    // and mid-range spot checks against the reference expansion
    val golden = Seq(0x00 -> -32124, 0x80 -> 32124, 0xFF -> 0,
      0x7F -> 0, 0x55 -> -716, 0xAB -> 5116, 0x10 -> -15996,
      0xE3 -> 324)
    for ((u, s) <- golden)
      assert(Multimodal.mulawExpand(u) == s, f"mulaw 0x$u%02X")
    // a genuine format-7 WAV round-trips through the shared chunk walk
    val bytes = (0 until 48).map(i => ((i * 37) % 256).toByte).toArray
    val bb = java.nio.ByteBuffer.allocate(44 + bytes.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + bytes.length)
    bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(7) // µ-law
    bb.putShort(1); bb.putInt(8000); bb.putInt(8000); bb.putShort(1)
    bb.putShort(8)
    bb.put("data".getBytes); bb.putInt(bytes.length); bb.put(bytes)
    val out = Multimodal.decodeWavSamples(bb.array()).get
    assert(out.length == bytes.length)
    assert(out.toSeq == bytes.toSeq.map(b =>
      Multimodal.mulawExpand(b & 0xff)))
    // unsupported format/bit combinations still reject cleanly
    val bad = bb.array().clone(); bad(20) = 3 // format 3 = IEEE float
    assert(Multimodal.decodeWavSamples(bad).isEmpty)
  }

  test("fixMojibake: repairs double-encoded UTF-8, never touches " +
    "ASCII, legitimate Latin-1, or genuine wide Unicode") {
    val fix = TextOps.fixMojibake _
    assert(fix("plain ascii") == "plain ascii")
    assert(fix("caf\u00c3\u00a9 menu") == "caf\u00e9 menu")
    assert(fix("na\u00c3\u00afve") == "na\u00efve")
    // a real e-acute: 0xE9 + space is NOT valid UTF-8 -> untouched
    assert(fix("caf\u00e9 menu") == "caf\u00e9 menu")
    // wide Unicode (beyond Latin-1) passes through
    assert(fix("\u65e5\u672c") == "\u65e5\u672c")
    // CP1252 smart-quote damage (the r19 leg): U+20AC/U+0153 map
    // back to bytes 0x80/0x9C, the undefined slot 0x9D arrives as
    // the C1 control — E2 80 9C ... E2 80 9D decodes to real quotes
    assert(fix("\u00e2\u20ac\u0153hi\u00e2\u20ac\u009d") ==
      "\u201chi\u201d")
    // …and the apostrophe shape (0x99's CP1252 image is U+2122):
    // E2 80 99 is the right single quote
    assert(fix("don\u00e2\u20ac\u2122t") == "don\u2019t")
    // GENUINE smart quotes stay: inverse byte 0x93 is a continuation
    // byte, never a valid UTF-8 lead
    assert(fix("\u201chi\u201d") == "\u201chi\u201d")
    // genuine euro amount stays: 0x80 alone cannot parse as UTF-8
    assert(fix("\u20ac100") == "\u20ac100")
    // wide char OUTSIDE the CP1252 block mixed with damage -> cannot
    // be a single-byte mis-decode, pass through whole
    assert(fix("caf\u00c3\u00a9 \u65e5") == "caf\u00c3\u00a9 \u65e5")
  }

  test("decodeAudioHeader: FLAC/MP3/ADTS honest labels, strict " +
    "rejection of WAV, images, truncation, and mislabeled layers") {
    import Multimodal.{AudioMeta, decodeAudioHeader,
      decodeFlacHeader, decodeMp3Header, decodeAdtsHeader}
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // FLAC: rate 12000 / stereo / 16-bit packed into STREAMINFO
    // bytes 10-17: 12000<<44 | 1<<41 | 15<<36 | 1000
    val pack = (12000L << 44) | (1L << 41) | (15L << 36) | 1000L
    val flac = hx("664C6143" + "80" + "000022" + "1000" + "1000" +
      "000000" + "000000" + f"$pack%016X" + "00" * 16)
    assert(decodeFlacHeader(flac).contains(AudioMeta("flac", 12000, 2)))
    // truncated STREAMINFO and a non-STREAMINFO first block reject
    assert(decodeFlacHeader(flac.take(20)).isEmpty)
    val wrongBlock = flac.clone(); wrongBlock(4) = 0x84.toByte
    assert(decodeFlacHeader(wrongBlock).isEmpty)
    // MP3 behind an ID3v2 tag (syncsafe size 5 + 5 pad bytes):
    // FF FB 94 C0 = MPEG-1 Layer III, 48 kHz, mono
    val mp3 = hx("494433030000" + "00000005" + "00" * 5 + "FFFB94C0")
    assert(decodeMp3Header(mp3).contains(AudioMeta("mp3", 48000, 1)))
    // bare frame, 44.1 kHz stereo
    assert(decodeMp3Header(hx("FFFB9000"))
      .contains(AudioMeta("mp3", 44100, 2)))
    // MPEG-2.5 Layer III uses the low-rate table (srIdx 2 -> 8 kHz)
    assert(decodeMp3Header(hx("FFE39800"))
      .contains(AudioMeta("mp3", 8000, 2)))
    // Layer II is NOT mp3 — label would be dishonest
    assert(decodeMp3Header(hx("FFFD9000")).isEmpty)
    // reserved sample-rate index rejects
    assert(decodeMp3Header(hx("FFFB9C00")).isEmpty)
    // ADTS: sfi 10 (11025), channel config 2
    assert(decodeAdtsHeader(hx("FFF1688000FFFC"))
      .contains(AudioMeta("aac", 11025, 2)))
    // channel config 0 (in-stream PCE) is not header-knowable
    assert(decodeAdtsHeader(hx("FFF1600000FFFC")).isEmpty)
    // nonzero layer bits break the ADTS sync contract
    assert(decodeAdtsHeader(hx("FFF3688000FFFC")).isEmpty)
    // cross-rejection: the PCM WAV and a PNG magic sniff to None on
    // the audio side; FLAC bytes sniff to None on the image side
    val wav = hx("524946462400000057415645666D7420")
    assert(decodeAudioHeader(wav).isEmpty)
    assert(decodeAudioHeader(hx("89504E470D0A1A0A")).isEmpty)
    assert(Multimodal.decodeImageHeader(flac).isEmpty)
    // the one-call sibling resolves each container
    assert(decodeAudioHeader(flac).exists(_.format == "flac"))
    assert(decodeAudioHeader(mp3).exists(_.format == "mp3"))
    assert(decodeAudioHeader(hx("FFF1688000FFFC"))
      .exists(_.format == "aac"))
  }

  test("decodeWebpHeader: all three first-chunk layouts, alpha flags, " +
    "strict sync/version/signature rejection (r20)") {
    import Multimodal.{ImgMeta, decodeWebpHeader}
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // VP8 lossy: 3-byte tag, 9D 01 2A sync, LE16 dims 20x11
    val vp8 = hx("52494646" + "16000000" + "57454250" +
      "56503820" + "0A000000" + "000000" + "9D012A" + "1400" + "0B00")
    assert(decodeWebpHeader(vp8).contains(ImgMeta("webp", 20, 11, 24)))
    // broken sync code rejects
    val badSync = vp8.clone(); badSync(23) = 0x2b.toByte
    assert(decodeWebpHeader(badSync).isEmpty)
    // VP8L: 0x2F + packed (w-1=19, h-1=10, alpha=1, version=0):
    // 19 | 10<<14 | 1<<28 = 0x10028013
    val vp8l = hx("52494646" + "11000000" + "57454250" +
      "5650384C" + "05000000" + "2F" + "13800210")
    assert(decodeWebpHeader(vp8l).contains(ImgMeta("webp", 20, 11, 32)))
    // nonzero VP8L version rejects (bit 29)
    val badVer = hx("52494646" + "11000000" + "57454250" +
      "5650384C" + "05000000" + "2F" + "13800230")
    assert(decodeWebpHeader(badVer).isEmpty)
    // VP8X: alpha flag 0x10, 24-bit minus-one canvas dims 20x11
    val vp8x = hx("52494646" + "16000000" + "57454250" +
      "56503858" + "0A000000" + "10" + "000000" + "130000" + "0A0000")
    assert(decodeWebpHeader(vp8x).contains(ImgMeta("webp", 20, 11, 32)))
    val vp8xNoA = vp8x.clone(); vp8xNoA(20) = 0
    assert(decodeWebpHeader(vp8xNoA).contains(ImgMeta("webp", 20, 11, 24)))
    // a RIFF/WAVE (same outer grammar, wrong form type) rejects, and
    // the one-call image sniff resolves webp without disturbing WAV's
    // audio-side role
    assert(decodeWebpHeader(hx("52494646" + "24000000" + "57415645" +
      "666D7420")).isEmpty)
    assert(Multimodal.decodeImageHeader(vp8).exists(_.format == "webp"))
    assert(Multimodal.decodeAudioHeader(vp8).isEmpty)
  }

  test("decodeAvifHeader: ftyp brand gate, meta/iprp/ipco walk, ispe " +
    "dims, pixi depth with absent-default (r20)") {
    import Multimodal.{ImgMeta, decodeAvifHeader}
    def be32(x: Int) = f"$x%08X"
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def avif(brand: String, pixi: String): Array[Byte] = {
      val ispe = "00000014" + "69737065" + "00000000" +
        be32(33) + be32(21)
      val ipcoLen = 8 + 20 + pixi.length / 2
      val body = be32(ipcoLen) + "6970636F" + ispe + pixi
      val iprp = be32(ipcoLen + 8) + "69707270" + body
      val meta = be32(ipcoLen + 20) + "6D657461" + "00000000" + iprp
      hx("00000010" + "66747970" +
        brand.getBytes("US-ASCII").map(b => f"$b%02X").mkString +
        "00000000" + meta)
    }
    // 10-bit pixi -> 30 bpp
    val p10 = "00000010" + "70697869" + "00000000" + "03" + "0A0A0A"
    assert(decodeAvifHeader(avif("avif", p10))
      .contains(ImgMeta("avif", 33, 21, 30)))
    // absent pixi -> the 8-bit RGB default
    assert(decodeAvifHeader(avif("avif", ""))
      .contains(ImgMeta("avif", 33, 21, 24)))
    // a non-AVIF brand with the same box shape rejects (an MP4 video
    // must stay the decodeMp4Samples family's subject)
    assert(decodeAvifHeader(avif("isom", p10)).isEmpty)
    // avif listed only as a COMPATIBLE brand still accepts
    val compat = {
      val base = avif("mif1", p10)
      val withBrand = hx("00000014" + "66747970" + "6D696631" +
        "00000000" + "61766966") ++ base.drop(16)
      withBrand
    }
    assert(decodeAvifHeader(compat).exists(_.format == "avif"))
    assert(Multimodal.decodeImageHeader(avif("avif", p10))
      .exists(_.format == "avif"))
  }

  test("decodeOggHeader: Opus and Vorbis id headers, BOS gate, " +
    "version gates (r20)") {
    import Multimodal.{AudioMeta, decodeOggHeader}
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def page(lacing: Int, pkt: String, flags: String = "02") =
      hx("4F676753" + "00" + flags + "00" * 8 + "01000000" +
        "00000000" + "00000000" + "01" + f"$lacing%02X" + pkt)
    // OpusHead: version 1, 2 ch, rate 16000 (LE)
    val opus = page(19, "4F70757348656164" + "01" + "02" + "0000" +
      "803E0000" + "0000" + "00")
    assert(decodeOggHeader(opus).contains(AudioMeta("opus", 16000, 2)))
    // Vorbis id: 01+"vorbis", version 0, 1 ch, 24000
    val vorb = page(30, "01" + "766F72626973" + "00000000" + "01" +
      "C05D0000" + "00" * 12 + "66" + "01")
    assert(decodeOggHeader(vorb).contains(AudioMeta("vorbis", 24000, 1)))
    // a non-BOS page is not an id header
    assert(decodeOggHeader(page(19, "4F70757348656164" + "01" + "02" +
      "0000" + "803E0000" + "0000" + "00", flags = "00")).isEmpty)
    // wrong OpusHead version rejects; nonzero vorbis_version rejects
    assert(decodeOggHeader(page(19, "4F70757348656164" + "02" + "02" +
      "0000" + "803E0000" + "0000" + "00")).isEmpty)
    assert(decodeOggHeader(page(30, "01" + "766F72626973" + "01000000" +
      "01" + "C05D0000" + "00" * 12 + "66" + "01")).isEmpty)
    // the audio one-call resolves ogg and FLAC keeps precedence
    assert(Multimodal.decodeAudioHeader(opus).exists(_.format == "opus"))
    assert(Multimodal.decodeAudioHeader(vorb)
      .exists(_.format == "vorbis"))
  }

  test("decodeMp3Header r20: bounded forward scan after a padded " +
    "ID3v2 tag; no scan without a tag") {
    import Multimodal.{AudioMeta, decodeMp3Header}
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // tag declares 4 body bytes; 6 pad bytes follow BEYOND the
    // declared size; the frame sits at tag-end + 6
    val padded = hx("494433030000" + "00000004" + "00" * 4 + "00" * 6 +
      "FFFB94C0")
    assert(decodeMp3Header(padded).contains(AudioMeta("mp3", 48000, 1)))
    // scanned positions require a REAL bitrate index — free-format
    // (0) in pad garbage is not evidence of a frame
    val freeFmt = hx("494433030000" + "00000004" + "00" * 4 + "00" * 6 +
      "FFFB04C0")
    assert(decodeMp3Header(freeFmt).isEmpty)
    // invalid bitrate index 15 rejects even at the exact tag end
    assert(decodeMp3Header(hx("494433030000" + "00000000" + "FFFBF4C0"))
      .isEmpty)
    // without an ID3 tag the sync must open the file — no scanning
    // arbitrary binaries
    assert(decodeMp3Header(hx("00" * 6 + "FFFB94C0")).isEmpty)
    // pad distance beyond the 512-byte scan window -> None (bounded)
    val farPad = hx("494433030000" + "00000000" + "00" * 520 +
      "FFFB94C0")
    assert(decodeMp3Header(farPad).isEmpty)
  }

  test("decodeWavSamples: STEREO IMA ADPCM de-interleaves dual " +
    "headers and 4-byte nibble groups, L,R output (r20)") {
    import Multimodal.{adpcmDecodeBlock, decodeWavSamples}
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def le16(x: Int) = f"${x & 0xff}%02X${(x >> 8) & 0xff}%02X"
    // one stereo block, blockAlign 16: headers (predL=100, idx 0),
    // (predR=-50, idx 0); ch0 nibbles 1..8, ch1 nibbles 9..15,0
    val data = le16(100) + "0000" + le16(-50 & 0xffff) + "0000" +
      "21436587" + "A9CBED0F"
    val wav = hx("52494646" + le16(40 + 16) + "0000" + "57415645" +
      "666D7420" + "14000000" + "1100" + "0200" + "401F0000" +
      "A00F0000" + "1000" + "0400" + "0200" + "0900" +
      "64617461" + le16(16) + "0000" + data)
    val got = decodeWavSamples(wav).get
    val l = adpcmDecodeBlock(100, 0, Array(1, 2, 3, 4, 5, 6, 7, 8))
    val r = adpcmDecodeBlock(-50, 0, Array(9, 10, 11, 12, 13, 14, 15, 0))
    assert(got.length == 18)
    assert(got.grouped(2).map(_(0)).toSeq == l.toSeq)
    assert(got.grouped(2).map(_(1)).toSeq == r.toSeq)
    // stereo blockAlign that doesn't split into dual 4-byte groups
    // rejects; >2 channels stays the no-garbage None
    val badAlign = wav.clone()
    badAlign(32) = 15 // blockAlign 15
    assert(decodeWavSamples(badAlign).isEmpty)
    val tri = wav.clone()
    tri(22) = 3 // channels 3
    assert(decodeWavSamples(tri).isEmpty)
  }

  test("decodeGifHeader / decodeTiffHeader: header-only census sniff " +
    "yields dims without touching pixel payloads") {
    // GIF: 9x8 screen, 16-entry table -> 4 index bits; truncate the
    // bytes right after the tables — header decode must still work
    val pal = Array.tabulate(16)(i => i * 17)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes("US-ASCII"))
    out.write(Array[Byte](9, 0, 8, 0, (0x80 | 0x70 | 3).toByte, 0, 0))
    pal.foreach { g => out.write(g); out.write(g); out.write(g) }
    val m = Multimodal.decodeGifHeader(out.toByteArray).get
    assert(m == Multimodal.ImgMeta("gif", 9, 8, 4), m.toString)
    // the sniffing one-call form picks them up too
    assert(Multimodal.decodeImageHeader(out.toByteArray)
      .exists(_.format == "gif"))
    // TIFF: a header+IFD with NO strip bytes present — dims still
    // resolve (the header-only promise); RGB spp scales the bit depth
    val bb = java.nio.ByteBuffer.allocate(8 + 2 + 9 * 12 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42)
    bb.putInt(8)
    bb.putShort(9)
    def e(tag: Int, typ: Int, cnt: Int, vv: Int): Unit = {
      bb.putShort(tag.toShort); bb.putShort(typ.toShort); bb.putInt(cnt)
      if (typ == 3) { bb.putShort(vv.toShort); bb.putShort(0) }
      else bb.putInt(vv)
    }
    e(256, 3, 1, 33); e(257, 3, 1, 21); e(258, 3, 1, 8)
    e(259, 3, 1, 1); e(262, 3, 1, 2); e(273, 4, 1, 999999)
    e(277, 3, 1, 3); e(278, 3, 1, 21); e(279, 4, 1, 33 * 21 * 3)
    bb.putInt(0)
    val tm = Multimodal.decodeTiffHeader(bb.array()).get
    assert(tm == Multimodal.ImgMeta("tiff", 33, 21, 24), tm.toString)
    // the PIXEL decode of the same bytes rejects (strip out of range)
    assert(Multimodal.decodeTiffGray(bb.array()).isEmpty)
  }

  test("alawExpand goldens + format-6 WAV decode end-to-end") {
    // published G.711 A-law properties: quiet codes ±8 (no true
    // zero), full-scale ±32256, inverted sign polarity vs µ-law,
    // segment-1 boundary spot checks
    val golden = Seq(0xD5 -> 8, 0x55 -> -8, 0xAA -> 32256,
      0x2A -> -32256, 0xC5 -> 264, 0x45 -> -264, 0xFF -> 848,
      0x7F -> -848)
    for ((a, s) <- golden)
      assert(Multimodal.alawExpand(a) == s, f"alaw 0x$a%02X: " +
        s"${Multimodal.alawExpand(a)} != $s")
    // a genuine format-6 WAV round-trips through the shared chunk walk
    val bytes = (0 until 48).map(i => ((i * 41) % 256).toByte).toArray
    val bb = java.nio.ByteBuffer.allocate(44 + bytes.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + bytes.length)
    bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(6) // A-law
    bb.putShort(1); bb.putInt(8000); bb.putInt(8000); bb.putShort(1)
    bb.putShort(8)
    bb.put("data".getBytes); bb.putInt(bytes.length); bb.put(bytes)
    val out = Multimodal.decodeWavSamples(bb.array()).get
    assert(out.toSeq == bytes.toSeq.map(b =>
      Multimodal.alawExpand(b & 0xff)))
  }

  test("adpcmDecodeBlock hand goldens; format-0x11 WAV: per-block " +
    "state reset, low-nibble-first order, trailing partial ignored") {
    // hand-computed from the IMA tables at pred 0, index 0:
    // nib 2 (step 7): diff = 7>>1 = 3 → +3, index −1 → clamp 0
    assert(Multimodal.adpcmDecodeBlock(0, 0, Array(2)).toSeq ==
      Seq(0, 3))
    // nib 10 = 8|2: same magnitude, sign bit → −3
    assert(Multimodal.adpcmDecodeBlock(0, 0, Array(10)).toSeq ==
      Seq(0, -3))
    // nib 7 (step 7): 0+1+3+7 = 11, index +8 → step 16;
    // then nib 1: 16>>3 + 16>>2 = 6 → 17
    assert(Multimodal.adpcmDecodeBlock(0, 0, Array(7, 1)).toSeq ==
      Seq(0, 11, 17))
    // the q201 linearity margin: no predictor in ±2000 can clamp
    val maxOff = Multimodal.adpcmDecodeBlock(0, 0,
      Array(5, 13, 3, 11, 7, 15, 1, 9, 2, 10, 6, 14, 0, 8, 4, 12))
      .map(math.abs).max
    assert(maxOff + 2000 < 32767, s"clamp margin: $maxOff")
    // a two-block WAV: blocks decode INDEPENDENTLY from their own
    // headers (predictors 100 and -700, indexes 0 and 3), nibbles
    // low-first; a trailing partial block is ignored
    val nibs = Array(5, 13, 3, 11, 7, 15, 1, 9)
    val dataBytes = nibs.grouped(2).map { case Array(lo, hi) =>
      (lo | (hi << 4)).toByte
    }.toArray
    val ba = 4 + dataBytes.length // blockAlign 8 → 9 samples/block
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * ba + 3)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + 2 * ba + 3)
    bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(0x11)
    bb.putShort(1); bb.putInt(8000); bb.putInt(4000)
    bb.putShort(ba.toShort); bb.putShort(4)
    bb.put("data".getBytes); bb.putInt(2 * ba + 3)
    bb.putShort(100); bb.put(0.toByte); bb.put(0.toByte)
    bb.put(dataBytes)
    bb.putShort(-700); bb.put(3.toByte); bb.put(0.toByte)
    bb.put(dataBytes)
    bb.put(Array[Byte](1, 2, 3)) // trailing partial block
    val out = Multimodal.decodeWavSamples(bb.array()).get
    val expected = Multimodal.adpcmDecodeBlock(100, 0, nibs) ++
      Multimodal.adpcmDecodeBlock(-700, 3, nibs)
    assert(out.toSeq == expected.toSeq)
    // STEREO IMA-ADPCM must return None, never mono-decoded garbage:
    // channels=2 interleaves per-channel headers and nibble groups
    // this walk does not model (the r18 ADVICE finding) — flip only
    // the channel count in the fmt chunk (byte offset 22)
    val stereo = bb.array().clone()
    stereo(22) = 2
    assert(Multimodal.decodeWavSamples(stereo).isEmpty)
  }

  test("decodePngGray goldens: all five filters round-trip through a " +
    "REAL deflater, multi-IDAT concatenation, CRC rejection, and the " +
    "PNG print equals the BMP print of the same pixels") {
    def png(pixels: Array[Array[Int]], filterOf: Int => Int,
            splitIdat: Boolean = false): Array[Byte] = {
      val h = pixels.length; val w = pixels(0).length
      val raw = new Array[Byte](h * (1 + w))
      for (r <- 0 until h) {
        val f = filterOf(r)
        raw(r * (1 + w)) = f.toByte
        for (c <- 0 until w) {
          val p = pixels(r)(c)
          val left = if (c > 0) pixels(r)(c - 1) else 0
          val up = if (r > 0) pixels(r - 1)(c) else 0
          val ul = if (r > 0 && c > 0) pixels(r - 1)(c - 1) else 0
          val pred = f match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 =>
              val q = left + up - ul
              val (pa, pb, pc) =
                (math.abs(q - left), math.abs(q - up), math.abs(q - ul))
              if (pa <= pb && pa <= pc) left
              else if (pb <= pc) up else ul
          }
          raw(r * (1 + w) + 1 + c) = ((p - pred) & 0xff).toByte
        }
      }
      val defl = new java.util.zip.Deflater()
      defl.setInput(raw); defl.finish()
      val zbuf = new Array[Byte](raw.length + 64)
      val zlen = defl.deflate(zbuf); defl.end()
      val z = zbuf.take(zlen)
      def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
        val crc = new java.util.zip.CRC32()
        val tb = typ.getBytes("US-ASCII")
        crc.update(tb); crc.update(data)
        java.nio.ByteBuffer.allocate(12 + data.length)
          .putInt(data.length).put(tb).put(data)
          .putInt(crc.getValue.toInt).array()
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h)
        .put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        .put(0.toByte).array()
      val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte)
      val idats =
        if (splitIdat) // real encoders split IDAT; decode concatenates
          chunk("IDAT", z.take(z.length / 2)) ++
            chunk("IDAT", z.drop(z.length / 2))
        else chunk("IDAT", z)
      sig ++ chunk("IHDR", ihdr) ++ idats ++
        chunk("IEND", Array.empty[Byte])
    }
    val px = Array.tabulate(8, 9)((r, c) =>
      ((r * 29 + c * 53) * (r + c + 2)) % 240)
    def rows(m: Array[Array[Int]]) = m.map(_.toSeq).toSeq
    // every filter type exercised: all-None, and cycling r % 5
    assert(Multimodal.decodePngGray(png(px, _ => 0)).map(rows)
      .contains(rows(px)))
    assert(Multimodal.decodePngGray(png(px, r => r % 5)).map(rows)
      .contains(rows(px)))
    for (f <- 1 to 4)
      assert(Multimodal.decodePngGray(png(px, _ => f)).map(rows)
        .contains(rows(px)), s"filter $f failed to round-trip")
    // multi-IDAT streams concatenate before inflation
    assert(Multimodal.decodePngGray(png(px, r => r % 5, splitIdat = true))
      .map(rows).contains(rows(px)))
    // cross-container print equality: the hash is over PIXELS, so the
    // PNG and BMP prints of the same image are the same 64 bits —
    // mixed-container corpora dedup in one space
    val bmpBytes = {
      val rowBytes = 28
      val bb = java.nio.ByteBuffer.allocate(54 + rowBytes * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("BM".getBytes); bb.putInt(54 + rowBytes * 8); bb.putInt(0)
      bb.putInt(54); bb.putInt(40); bb.putInt(9); bb.putInt(8)
      bb.putShort(1); bb.putShort(24); bb.putInt(0); bb.putInt(rowBytes * 8)
      bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
      for (s <- 0 until 8; c <- 0 until 9) {
        val p = px(7 - s)(c).toByte
        bb.put(p); bb.put(p); bb.put(p)
        if (c == 8) bb.put(0.toByte)
      }
      bb.array()
    }
    assert(Multimodal.pngDHash(png(px, r => r % 5)) ==
      Multimodal.bmpDHash(bmpBytes))
    // integrity: a flipped bit in IDAT data breaks that chunk's CRC
    val good = png(px, r => r % 5)
    val corrupt = good.clone()
    corrupt(40) = (corrupt(40) ^ 0x01).toByte // inside IDAT data
    assert(Multimodal.decodePngGray(corrupt).isEmpty)
    // truncation, wrong color type, junk: None, never exceptions
    assert(Multimodal.decodePngGray(good.take(50)).isEmpty)
    assert(Multimodal.decodePngGray(null).isEmpty)
    assert(Multimodal.decodePngGray("PNG nope".getBytes).isEmpty)
    val rgb = good.clone(); rgb(25) = 2.toByte // color type → CRC breaks too
    assert(Multimodal.decodePngGray(rgb).isEmpty)
  }

  test("decodePngGray truecolor: bpp-3 filter reconstruction (left = " +
    "3 bytes back) round-trips all filters; gray = channel average") {
    def pngRgb(chan: (Int, Int, Int) => Int, w: Int, h: Int,
               filterOf: Int => Int): Array[Byte] = {
      val stride = 1 + 3 * w
      val raw = new Array[Byte](h * stride)
      def cv(r: Int, c: Int, k: Int) =
        if (r < 0 || c < 0) 0 else chan(r, c, k)
      for (r <- 0 until h) {
        val f = filterOf(r)
        raw(r * stride) = f.toByte
        for (c <- 0 until w; k <- 0 until 3) {
          val p = cv(r, c, k)
          val left = cv(r, c - 1, k)
          val up = cv(r - 1, c, k)
          val ul = cv(r - 1, c - 1, k)
          val pred = f match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 =>
              val q = left + up - ul
              val (pa, pb, pc) =
                (math.abs(q - left), math.abs(q - up), math.abs(q - ul))
              if (pa <= pb && pa <= pc) left
              else if (pb <= pc) up else ul
          }
          raw(r * stride + 1 + 3 * c + k) = ((p - pred) & 0xff).toByte
        }
      }
      val defl = new java.util.zip.Deflater()
      defl.setInput(raw); defl.finish()
      val zbuf = new Array[Byte](raw.length + 64)
      val zlen = defl.deflate(zbuf); defl.end()
      def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
        val crc = new java.util.zip.CRC32()
        val tb = typ.getBytes("US-ASCII")
        crc.update(tb); crc.update(data)
        java.nio.ByteBuffer.allocate(12 + data.length)
          .putInt(data.length).put(tb).put(data)
          .putInt(crc.getValue.toInt).array()
      }
      val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
        .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte)
        .put(0.toByte).array()
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte) ++
        chunk("IHDR", ihdr) ++ chunk("IDAT", zbuf.take(zlen)) ++
        chunk("IEND", Array.empty[Byte])
    }
    // channels deliberately distinct so a channel-order or stride slip
    // changes the average
    def chan(r: Int, c: Int, k: Int) =
      (((r * 29 + c * 53) * (r + c + 2)) % 200) + k * 15
    val expected = Seq.tabulate(8, 9)((r, c) =>
      (chan(r, c, 0) + chan(r, c, 1) + chan(r, c, 2)) / 3)
    for (fs <- Seq((_: Int) => 0, (r: Int) => r % 5))
      assert(Multimodal.decodePngGray(pngRgb(chan, 9, 8, fs))
        .map(_.map(_.toSeq).toSeq).contains(expected),
        "truecolor decode diverged")
  }

  test("imagePhashDedup end-to-end: brightness twins pair at hamming 0, " +
    "distinct images stay unpaired, undecodable rows keep null hashes") {
    def bmp(seed: Int): Array[Byte] = {
      val px = Array.tabulate(8, 9)((r, c) =>
        ((r * 29 + c * 53 + seed) * (r + c + 2) + seed * seed) % 240)
      val rowBytes = 28
      val bb = java.nio.ByteBuffer.allocate(54 + rowBytes * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("BM".getBytes("US-ASCII")); bb.putInt(54 + rowBytes * 8)
      bb.putInt(0); bb.putInt(54); bb.putInt(40); bb.putInt(9); bb.putInt(8)
      bb.putShort(1); bb.putShort(24); bb.putInt(0); bb.putInt(rowBytes * 8)
      bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
      for (s <- 7 to 0 by -1) {
        for (c <- 0 until 9) {
          val p = px(s)(c).toByte; bb.put(p); bb.put(p); bb.put(p)
        }
        bb.put(0.toByte)
      }
      bb.array()
    }
    def brighten(b: Array[Byte]): Array[Byte] = {
      val out = b.clone()
      for (i <- 54 until out.length) // +5 on every channel byte (no clip)
        if ((i - 54) % 28 < 27) out(i) = (out(i) + 5).toByte
      out
    }
    val rows = spark.sparkContext.parallelize(Seq(
      org.apache.spark.sql.Row(1L, "image", bmp(3)),
      org.apache.spark.sql.Row(2L, "image", brighten(bmp(3))),
      org.apache.spark.sql.Row(3L, "image", bmp(77)),
      org.apache.spark.sql.Row(4L, "image", "not a bitmap".getBytes)))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val out = Multimodal.imagePhashDedup(media).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out(1L)._1.isDefined && out(1L)._1 == out(2L)._1) // same hash
    assert(out(1L)._2 == 1L && out(1L)._3.contains(2L))
    assert(out(2L)._2 == 1L && out(2L)._3.contains(1L))
    assert(out(3L)._2 == 0L, "distinct image must not pair")
    assert(out(4L)._1.isEmpty && out(4L)._2 == 0L) // undecodable: null row
    Caches.clear()
  }

  test("kmeansClusters: Lloyd rounds converge on separated groups; an " +
    "empty cluster carries its centroid; ties break to min cluster") {
    import spark.implicits._
    // two tight pairs far apart; seeds (the 2 smallest ids) both start
    // inside group A, and the update rounds still pull cluster 1 onto
    // group B — the recovery Lloyd is for
    val df = Seq(
      (1L, Array(0.0f, 0.0f), 0), (2L, Array(0.002f, 0.0f), 0),
      (3L, Array(10.0f, 10.0f), 1), (4L, Array(10.002f, 10.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.kmeansClusters(df, "vec_id", "embedding",
        "label", k = 2, iters = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(1L)._1 == 0L && out(2L)._1 == 0L)
    assert(out(3L)._1 == 1L && out(4L)._1 == 1L)
    // final centroids are the integer group means (1,0)/(10001,10000):
    // every member sits at squared distance exactly 1
    assert(out.values.forall(_._2 == 1L), s"dists: $out")
    Caches.clear()
    // duplicate seeds: ids 1 and 2 are identical, so clusters 0 and 1
    // seed on the same point; every tie assigns to min cluster, cluster
    // 1 goes empty and must carry its centroid (no crash, no NaN mean)
    val dup = Seq(
      (1L, Array(0.0f, 0.0f), 0), (2L, Array(0.0f, 0.0f), 0),
      (3L, Array(10.0f, 10.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val clusters = Similarity.kmeansClusters(dup, "vec_id", "embedding",
        "label", k = 3, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(clusters == Map(1L -> 0L, 2L -> 0L, 3L -> 2L), s"$clusters")
    Caches.clear()
  }

  test("semDedup: within a cluster the dup-pair member nearer the " +
    "centroid is dropped; orthogonal members survive") {
    import spark.implicits._
    // seeds span the groups (ids 1/2); ids 1 and 3 are colinear
    // (cosine 1.0 ≥ τ) and share a cluster — id 3 ends nearer the
    // centroid, so the paper's keep-the-rim policy drops it
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.0f, 1.0f), 1),
      (3L, Array(0.9f, 0.0f), 0), (4L, Array(0.0f, -1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.semDedup(df, "vec_id", "embedding", "label",
        k = 2, iters = 1).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .toMap
    assert(out(1L) == (true, None))
    assert(out(3L) == (false, Some(1L)), s"$out")
    // orthogonal co-members (cosine 0 < τ) never pair
    assert(out(2L)._1 && out(4L)._1, s"$out")
    Caches.clear()
  }
}
