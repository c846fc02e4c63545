package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.VectorIndex

/** The standing ANN index must answer bit-equal to the inline IVF
  * ranker over the same live membership at every lifecycle stage
  * (bootstrap+append, post-takedown, post-compaction), keep the
  * mergeable-centroid fold exact (net partial sums ≡ one-shot sums —
  * integer arithmetic), and never shuffle the vectors table at search
  * time (the 100 TB claim: a probe batch pays its own routing, the
  * standing corpus is only ever read in place).
  */
class VectorIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private def emb = Tables.embeddings(spark, d)
  private def probeF = col("vec_id") % 50 === 0
  private def probes = Similarity.probes(emb, "vec_id", "embedding", probeF)

  private def inline(corpus: org.apache.spark.sql.DataFrame) =
    Similarity.ivfTopK(corpus, "vec_id", "embedding", "label",
      probeF, 3, nprobe = 2)

  private def assertSameRows(a: org.apache.spark.sql.DataFrame,
                             b: org.apache.spark.sql.DataFrame): Unit = {
    val (ra, rb) = (a.collect().toSeq, b.collect().toSeq)
    assert(ra.nonEmpty && ra == rb,
      s"lifecycle result diverged from inline twin " +
        s"(${ra.size} vs ${rb.size} rows)")
  }

  test("bootstrap+append search is bit-equal to the inline IVF ranker; " +
    "takedown answers as never-inserted; compaction preserves answers") {
    VectorIndex.write(emb.filter(col("vec_id") % 5 <= 2),
      "vec_id", "embedding", "label", "tvix")
    VectorIndex.append(emb.filter(col("vec_id") % 5 >= 3),
      "vec_id", "embedding", "label", "tvix")
    assertSameRows(VectorIndex.search(spark, "tvix", probes, 3, 2),
      inline(emb))
    Caches.clear()
    // planted batch in, then out: centroid partials must cancel exactly
    val planted = emb.filter(col("vec_id") % 7 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    VectorIndex.append(planted, "vec_id", "embedding", "label", "tvix")
    VectorIndex.delete(planted, "vec_id", "embedding", "label", "tvix")
    assertSameRows(VectorIndex.search(spark, "tvix", probes, 3, 2),
      inline(emb))
    Caches.clear()
    // compaction: same answers, one live file per occupied bucket, and
    // the tombstoned planted rows physically gone
    VectorIndex.compact(spark, "tvix")
    assertSameRows(VectorIndex.search(spark, "tvix", probes, 3, 2),
      inline(emb))
    Caches.clear()
    val vec = spark.table(graft.sources.Generations
      .physicalFor(spark, "tvix", "vectors"))
    assert(vec.filter(col("vec_id") >= 1000000L).count() == 0)
    assert(vec.filter(col("w") =!= 1).count() == 0)
    val files = vec.select(input_file_name()).distinct().count()
    assert(files <= VectorIndex.Buckets, s"$files files after compaction")
    // the centroid log is netted to one row per block
    val cent = spark.table(graft.sources.Generations
      .physicalFor(spark, "tvix", "centroids"))
    assert(cent.count() ==
      cent.select("block").distinct().count())
  }

  test("refreshFromDiff: refreshed index answers as one bootstrapped " +
    "fresh on the new generation; ingest is delta-proportional") {
    // gen1 = the q177 construction: subset + perturbed + extras
    val gen1 = emb.filter(col("vec_id") % 7 =!= 3)
      .withColumn("embedding",
        when(col("vec_id") % 11 === 0,
          transform(col("embedding"), x => x + lit(0.25f)))
          .otherwise(col("embedding")))
      .unionByName(emb.filter(col("vec_id") % 9 === 2)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("label"),
          transform(col("embedding"), x => -x).as("embedding")))
    VectorIndex.write(gen1, "vec_id", "embedding", "label", "tvrf")
    VectorIndex.refreshFromDiff(gen1, emb, "vec_id", "embedding",
      "label", "tvrf")
    assertSameRows(VectorIndex.search(spark, "tvrf", probes, 3, 2),
      inline(emb))
    Caches.clear()
    // delta-proportional: the refresh batch (b = 1) carries only the
    // removed extras' tombstones + changed pairs (±1) + added rows —
    // never the unchanged bulk
    val vec = spark.table(graft.sources.Generations
      .physicalFor(spark, "tvrf", "vectors"))
    val total = emb.count()
    val added = emb.filter(col("vec_id") % 7 === 3).count()
    val changed = emb.filter(col("vec_id") % 7 =!= 3 &&
      col("vec_id") % 11 === 0).count()
    val removed = emb.filter(col("vec_id") % 9 === 2).count()
    val batchRows = vec.filter(col("b") === 1L).count()
    assert(batchRows == added + 2 * changed + removed,
      s"refresh batch carried $batchRows rows")
    assert(batchRows < total, "refresh re-ingested the unchanged bulk")
    Caches.clear()
  }

  test("PQ codes layer: lifecycle ADC search is bit-equal to the " +
    "inline pqAdcTopK; takedown answers as never-inserted") {
    def adcInline(corpus: org.apache.spark.sql.DataFrame) =
      Similarity.pqAdcTopK(corpus, "vec_id", "embedding", "label",
        probeF, 3).orderBy("probe_id", "rank")
    VectorIndex.trainCodebook(emb, "embedding", "label", "tpqx")
    VectorIndex.writeCodes(emb.filter(col("vec_id") % 5 <= 2),
      "vec_id", "embedding", "label", "tpqx")
    VectorIndex.appendCodes(emb.filter(col("vec_id") % 5 >= 3),
      "vec_id", "embedding", "label", "tpqx")
    assertSameRows(VectorIndex.searchAdc(spark, "tpqx", probes, 3)
      .orderBy("probe_id", "rank"), adcInline(emb))
    Caches.clear()
    val planted = emb.filter(col("vec_id") % 7 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    VectorIndex.appendCodes(planted, "vec_id", "embedding", "label",
      "tpqx")
    VectorIndex.deleteCodes(planted, "vec_id", "embedding", "label",
      "tpqx")
    VectorIndex.compactCodes(spark, "tpqx")
    assertSameRows(VectorIndex.searchAdc(spark, "tpqx", probes, 3)
      .orderBy("probe_id", "rank"), adcInline(emb))
    Caches.clear()
    // post-compaction: tombstoned codes physically gone, net w = 1
    val codes = spark.table(graft.sources.Generations
      .physicalFor(spark, "tpqx_pq", "codes"))
    assert(codes.filter(col("vec_id") >= 1000000L).count() == 0)
    assert(codes.filter(col("w") =!= 1).count() == 0)
  }

  test("learned routing: trained-quantizer blocks make the standing " +
    "index bit-equal to the inline kmeans-routed ranker, and learned " +
    "PQ codes equal inline ADC over the learned clusters") {
    VectorIndex.trainCoarse(emb, "vec_id", "embedding", "tvl",
      k = 4, iters = 3)
    VectorIndex.writeLearned(emb.filter(col("vec_id") % 5 <= 2),
      "vec_id", "embedding", "tvl")
    VectorIndex.appendLearned(emb.filter(col("vec_id") % 5 >= 3),
      "vec_id", "embedding", "tvl")
    // the inline twin: assign clusters with the SAME Lloyd training,
    // then route the plain IVF ranker on them
    val withCl = emb.join(
      Similarity.kmeansClusters(emb, "vec_id", "embedding", "label",
        k = 4, iters = 3).select(col("vec_id"), col("cluster")),
      Seq("vec_id"))
    assertSameRows(VectorIndex.search(spark, "tvl", probes, 3, 2),
      Similarity.ivfTopK(withCl, "vec_id", "embedding", "cluster",
        probeF, 3, nprobe = 2))
    Caches.clear()
    // the PQ layer with codewords = learned clusters
    VectorIndex.trainCodebookLearned(emb, "embedding", "tvl")
    VectorIndex.writeCodesLearned(emb, "vec_id", "embedding", "tvl")
    assertSameRows(
      VectorIndex.searchAdc(spark, "tvl", probes, 3)
        .orderBy("probe_id", "rank"),
      Similarity.pqAdcTopK(withCl, "vec_id", "embedding", "cluster",
        probeF, 3).orderBy("probe_id", "rank"))
    Caches.clear()
  }

  test("drift-triggered reroute: stale routing degrades recall@3 on " +
    "the shifted corpus, the re-trained generation recovers it, and " +
    "the stale generation survives under retain = 1") {
    import graft.sources.Generations
    val p = "tvr"
    // the q182 re-embedding pair: old-model and new-model generations
    val gen1 = Caches.persistTracked(LlmQueries.q182Gen1(emb))
    val drifted = Caches.persistTracked(LlmQueries.q182Gen2(emb))
    VectorIndex.trainCoarse(gen1, "vec_id", "embedding", p,
      k = 4, iters = 3)
    VectorIndex.writeLearned(drifted, "vec_id", "embedding", p)
    val dprobes = Similarity.probes(drifted, "vec_id", "embedding",
      probeF)
    val exact = Caches.persistTracked(Similarity.bruteForceTopK(
      drifted, "vec_id", "embedding", probeF, 3))
    def avgRecall() = Similarity.recallAtK(exact,
      VectorIndex.search(spark, p, dprobes, 3, 1), 3)
      .agg(avg(col("recall"))).head().getDouble(0)
    val stale = avgRecall()
    val (gOld, _) = Generations.committedState(spark, p)
    VectorIndex.reroute(drifted, "vec_id", "embedding", p,
      k = 4, iters = 3, retain = 1)
    val fresh = avgRecall()
    assert(fresh > stale,
      f"reroute did not recover recall: stale=$stale%.3f fresh=$fresh%.3f")
    assert(fresh > 0.9, f"re-trained recall too low: $fresh%.3f")
    assert(stale < 0.5, f"planted drift did not degrade: $stale%.3f")
    // retention: the stale-routed generation's tables survived the flip
    assert(spark.catalog.tableExists(
      Generations.physical(p, "vectors", gOld)),
      "retain = 1 dropped the stale generation")
    Caches.clear()
  }

  test("screenSemantic: live same-block duplicate found with min-id " +
    "canonical, cross-block twin invisible, sub-threshold pair clean") {
    import spark.implicits._
    def vec(seed: Int): Array[Float] =
      (0 until 64).map(d => ((seed * 7 + d * 13) % 201 - 100) / 100.0f)
        .toArray
    val standing = Seq(
      (10L, vec(1), 0), (11L, vec(1), 0), // two copies of seed 1, block 0
      (12L, vec(1), 1),                   // same seed, OTHER block
      (13L, vec(2), 0)                    // different seed, block 0
    ).toDF("vec_id", "embedding", "label")
    VectorIndex.write(standing, "vec_id", "embedding", "label", "tvix3")
    val batch = Seq(
      (20L, vec(1), 0), // dup of 10/11 → canonical = min = 10
      (21L, vec(1), 2), // seed 1 but block 2: no same-block live member
      (22L, vec(3), 0)  // novel seed: sub-threshold vs seeds 1/2
    ).toDF("vec_id", "embedding", "label")
    val out = VectorIndex.screenSemantic(spark, batch, "vec_id",
      "embedding", "label", "tvix3").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), r.getBoolean(2)))
      .toMap
    Caches.clear()
    assert(out(20L) == (Some(10L), true))
    assert(out(21L) == (None, false))
    assert(out(22L) == (None, false))
  }

  test("the liveness fold and search plan never shuffle the vectors " +
    "table (bucketed scan, broadcast routing)") {
    VectorIndex.write(emb.filter(col("vec_id") % 5 <= 2),
      "vec_id", "embedding", "label", "tvix2")
    VectorIndex.append(emb.filter(col("vec_id") % 5 >= 3),
      "vec_id", "embedding", "label", "tvix2")
    val fold = spark.table("tvix2_vectors")
      .groupBy("block", "vec_id", "q", "norm2")
      .agg(sum(col("w")).as("net"))
      .queryExecution.executedPlan.toString
    assert(!fold.contains("Exchange"), fold)
    val plan = VectorIndex.search(spark, "tvix2", probes, 3, 2)
      .queryExecution.executedPlan.toString
    // the only Exchanges in the search plan belong to the probe/window
    // side; the vectors scan feeds its fold and the broadcast join
    // directly. Count is pinned loosely: no SortMergeJoin may appear
    // (the corpus is never co-shuffled against probes).
    assert(!plan.contains("SortMergeJoin"), plan)
    Caches.clear()
  }
}
