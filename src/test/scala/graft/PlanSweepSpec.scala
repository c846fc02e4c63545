package graft

import org.scalatest.funsuite.AnyFunSuite

/** The automated PLAN-REGRESSION gate: every registered query's physical
  * plan is swept for the two scale-killer join shapes — CartesianProduct
  * anywhere, BroadcastNestedLoopJoin outside the whitelisted
  * bounded-broadcast ANN shapes. At ~20 new queries per round a manual
  * `graft.tools.Explain` sweep eventually misses a regression; this spec
  * makes `sbt test` fail on one instead (the canary test proves the
  * detector actually fires on a planted cartesian).
  *
  * Division of labor: this spec is the inventory-WIDE join-shape sweep;
  * the targeted per-query plan pins (q55 zero-Exchange dispatch, q79/q83
  * one-shuffle as-ofs, broadcast carries, native kernels) live in
  * PlanShapeSpec, and the q98/q99 corpus-side zero-Exchange pin lives in
  * DedupIndexSpec where the bucketed tables it needs are built.
  */
class PlanSweepSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  /** Queries whose plans carry an INTENTIONAL bounded nested loop:
    * q39/q43/q68 broadcast a bounded probe/centroid set against the
    * corpus (the ANN design — see VERDICT-audited shapes), q72 composes
    * q39 + q43 for the recall eval, q73 crossJoins SINGLE-ROW aggregates
    * (n_exact + audit counts) onto its rows. Anything else that plans a
    * nested loop is a regression.
    */
  private val allowedNestedLoop = Set(
    "q39_ann_topk", "q43_ann_ivf", "q68_ann_ivf_nprobe2",
    "q72_ann_recall", "q73_dedup_recall",
    // q135's exact baseline + ADC scan share the ANN family's
    // broadcast-probe inequality join (self-exclusion on vec_id)
    "q135_pq_adc_recall",
    // hard-negative mining is q39's broadcast-probe scan with the
    // different-label predicate — same bounded build side
    "q145_hard_negatives",
    // the merged-HLL gate combines two ONE-ROW aggregates (merged
    // registers × exact distinct) via an explicit broadcast cross
    // join — the q143 1-row posture
    "q205_hll_merged")

  /** Queries EXCLUDED from the sweep because constructing their result
    * frame executes real side effects (writers, bucketed-table builds,
    * full micro-batched streams, iterative checkpoints, ML training) —
    * sweeping the read-back scan they return would assert nothing, and
    * executing them here would triple the spec's runtime. Each maps to
    * the spec that owns its plan/behavior posture instead, so the
    * exclusion is a pointer, not a hole.
    */
  private val executesEagerly = Map(
    "q66_constrained_append" -> "SourcesSinksSpec (sink roundtrip)",
    "q67_staging_roundtrip" -> "SourcesSinksSpec (sink roundtrip)",
    "q120_zorder_roundtrip" -> "ZOrderSpec (layout writer)",
    "q98_neardup_indexed" -> "DedupIndexSpec (bucketed index build; corpus-side zero-Exchange pinned there)",
    "q99_exact_indexed" -> "DedupIndexSpec (bucketed index build)",
    "q129_neardup_deleted" -> "DedupIndexSpec (delete/compact lifecycle; post-compaction plan pinned there)",
    "q130_exact_deleted" -> "DedupIndexSpec (delete/compact lifecycle)",
    "q188_partial_dedup_compact" -> "DedupIndexSpec (partial-compaction lifecycle: touched-bucket counts + full-compact equality pinned there)",
    "q154_bm25_indexed" -> "CorpusOpsSpec (bucketed retrieval-index build; indexed==inline + delete leg pinned there)",
    "q157_phrase_search" -> "CorpusOpsSpec (positional-index build + compaction; phrase joins + delete/compact equivalence pinned there)",
    "q187_partial_compact" -> "GenerationsSpec (partial compaction: touched-bucket rewrite + file carry-over + b0 flip pinned there); the search plan is q154's",
    "q159_index_refresh" -> "CorpusOpsSpec (diff-driven index refresh; refreshed==fresh-build + delta-only ingest pinned there)",
    "q160_vector_index" -> "VectorIndexSpec (standing ANN index build; search==ivfTopK + no-shuffle plan pinned there)",
    "q162_pq_index" -> "VectorIndexSpec (PQ codes-log build; searchAdc==pqAdcTopK pinned there; the ADC inequality join is the whitelisted q135 shape)",
    "q163_stats_refresh" -> "CorpusOpsSpec (ledger lifecycle; refreshed==fresh aggregation + bounded-partials pinned there)",
    "q165_phrase_snippets" -> "CorpusOpsSpec (positional-index build; snippet windows + clamping pinned there)",
    "q69_dup_clusters" -> "ComponentsSpec (iterative pointer-jumping checkpoints)",
    "q183_clusters_refresh" -> "ComponentsSpec (q69's component loop, run twice: gen1 cold + warm-started refresh; the warm-vs-cold equality and round saving are pinned there)",
    "q151_canonical_docs" -> "ComponentsSpec (q69's component loop) + LlmOpsSpec (selection policy)",
    "q53_region_ml" -> "StreamingAndMlSpec (model fit executes on construction)",
    "q100_streaming_asof_replay" -> "EventStreamsSpec (file-backed replay harness)",
    "q106_streaming_windows_replay" -> "EventStreamsSpec (file-backed replay harness)",
    "q112_streaming_sliding_replay" -> "EventStreamsSpec (file-backed replay harness)",
    "q113_streaming_interval_join" -> "EventStreamsSpec (file-backed replay harness)",
    "q131_late_windows_replay" -> "EventStreamsSpec (late-planted replay harness)",
    "q132_late_asof_replay" -> "EventStreamsSpec (late-planted replay harness)",
    "q152_streaming_sessions_replay" -> "EventStreamsSpec (file-backed replay harness)",
    "q136_streaming_index_ingest" -> "DedupIndexSpec owns the screen plans (foreachBatch ingest-loop harness)",
    "q190_streaming_maintenance" -> "CorpusOpsSpec owns the search plans; GenerationsSpec the compaction (foreachBatch maintenance-loop harness with the threshold policy inline)",
    "q161_streaming_vector_ingest" -> "VectorIndexSpec owns the screen plans (foreachBatch ingest-loop harness)",
    // q123's returned frame is a driver-local merge table (toDF of the
    // learned rules) — a LocalTableScan can never contain the swept
    // shapes, so sweeping it would pay the learning job to assert
    // nothing. q124/q125 STAY in the sweep: their construction also
    // runs a bounded prep job (vocab collect / minLang scalar), but
    // the returned plans are genuinely join-bearing — the sweep caught
    // q125's first constant-key BNLJ formulation.
    "q123_bpe_merges" -> "BpeSpec (driver-local merge table)",
    "q143_pagerank" -> "GraphSpec (iterative power-iteration checkpoints; per-round join shape pinned there)",
    "q148_label_prop" -> "GraphSpec (iterative propagation checkpoints; per-round join shape pinned there)",
    "q167_proximity_search" -> "CorpusOpsSpec (positional-index build; proximity-chain semantics pinned there)",
    "q168_proximity_ranked" -> "CorpusOpsSpec (positional-index build; boost-before-cut pinned there)",
    "q169_learned_vector_index" -> "VectorIndexSpec (learned-routing index build; search==ivfTopK-over-learned-blocks pinned there)",
    "q170_learned_recall" -> "VectorIndexSpec (learned-routing index build; recall join is the whitelisted q72 shape)",
    "q171_learned_pq_index" -> "VectorIndexSpec (learned-codeword PQ build; the ADC inequality join is the whitelisted q135 shape)",
    "q182_drift_reroute" -> "VectorIndexSpec (stale-routed build + drift-gated reroute run at construction; both search legs are the q169 routed shape, the recall joins the whitelisted q72 shape)",
    "q172_pagerank_refresh" -> "GraphSpec (converging power-iteration checkpoints — constructing the frame runs the full gen1+warm lifecycle; per-round join shape is q143's, pinned there)",
    "q173_shard_writer" -> "SourcesSinksSpec (shard-file writer — construction writes the delivery files; one-file-per-dir + token budget pinned there; the packing plan is swept via q149)",
    "q174_curation_pipeline" -> "ComponentsSpec (q69's component loop runs at construction) + the per-stage specs; the mix-pack plan is swept via q149 and the stage plans via q71/q94",
    "q175_rank_index" -> "RankIndexSpec (generation-manifest rank lifecycle — construction converges and commits; the per-round join shape is q143's, pinned in GraphSpec)",
    "q177_vector_refresh" -> "VectorIndexSpec (diff-driven index refresh — construction bootstraps + refreshes; refreshed==fresh + delta-only ingest pinned there; the search plan is q160's)",
    "q178_labelprop_refresh" -> "GraphSpec (converging LPA checkpoints — construction runs the gen1+warm lifecycle; per-round join shape is q148's, pinned there)")

  /** The detector under test: scan one physical-plan string for the
    * forbidden join shapes. Kept as a pure function so the canary test
    * below can prove it fires.
    */
  private[graft] def violations(name: String, plan: String): Seq[String] = {
    val v = Seq.newBuilder[String]
    if (plan.contains("CartesianProduct"))
      v += s"$name plans a CartesianProduct"
    if (!allowedNestedLoop(name) && plan.contains("BroadcastNestedLoopJoin"))
      v += s"$name plans a BroadcastNestedLoopJoin outside the whitelist"
    v.result()
  }

  test("every registered query plans free of cartesians and unlisted " +
    "nested loops") {
    val bad = for {
      (name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
      if !executesEagerly.contains(name)
      v <- violations(name,
        fn(spark, d).queryExecution.executedPlan.toString)
    } yield v
    Caches.clear()
    assert(bad.isEmpty, "plan sweep violations:\n" + bad.mkString("\n"))
  }

  test("the detector fires on a planted cartesian and nested loop " +
    "(gate canary)") {
    import org.apache.spark.sql.functions.expr
    val a = spark.range(3).toDF("x")
    val b = spark.range(3).toDF("y")
    val cartesian = a.crossJoin(b)
    assert(violations("canary",
      cartesian.queryExecution.executedPlan.toString).nonEmpty,
      "the sweep would not catch a planted cartesian")
    // an inequality-only join plans as BroadcastNestedLoopJoin
    val bnlj = a.join(b, expr("x < y"))
    assert(violations("canary",
      bnlj.queryExecution.executedPlan.toString).nonEmpty,
      "the sweep would not catch a planted nested-loop join")
  }

  test("whitelist and exclusion list only name registered queries " +
    "(no drift on rename)") {
    val registered = SparkEntry.queries.keySet
    val stale = (allowedNestedLoop ++ executesEagerly.keySet)
      .filterNot(registered)
    assert(stale.isEmpty,
      s"stale sweep entries (renamed/removed queries?): $stale")
  }
}
