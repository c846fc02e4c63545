package graft

import java.nio.file.{Files, Paths}

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line {"metric":...,"queries":{...}} for the driver —
  * both on stdout and to bench_out.json (sbt log noise buried the stdout
  * line in round 1; the file is the reliable channel).
  *
  * Timing = full materialization via the noop sink (every row produced on
  * the executors, nothing collected). count() would let column pruning
  * skip most of the work for projection-heavy queries.
  *
  * A query that throws is reported as -1 in "queries" and listed in
  * "errors" — never as a fake-fast timing.
  *
  * r19 budget posture: the 142-row headline at unconditional min-of-3
  * outgrew the driver's wall-clock cap (BENCH_r18 rc=124 — the first
  * round with no driver-verified perf artifact). Four levers:
  * (a) per-row iteration scheduling keyed on the committed history
  * ([[scheduledIters]]), (b) a FRESH per-run warehouse (a long
  * session had accreted 242 standing tables, taxing every lifecycle
  * gate's bootstrap ~20% in catalog/listing overhead — harness
  * artifact, not plan cost; SCALING.md), (c) a split-run mode
  * (SPARK_GRAFT_BENCH_PART=i/n) that lets the driver bench the headline
  * in two bounded invocations and still get one merged bench_out.json,
  * and (d) — measured to be the BIGGEST term — a family warmup
  * instead of the all-rows warmup (see the warmup comment in main:
  * warming all 145 rows cost ~1700 s of a 2533 s wall; the family set
  * warms the shared state at ~5% of that).
  *
  * r20, after a SECOND consecutive rc=124: every row with committed
  * history runs ONE draw (~150 draws total), the history floor is the
  * min over the last six committed snapshots (the one-draw ratchet
  * fix), and a post-pass retries only the rows whose draw exceeds
  * 1.4× the run's own median-drift-adjusted floor — see
  * [[scheduledIters]] and the retry-pass comment in [[main]]. Every
  * run publishes its "box_drift" so BenchDiff can normalize uniform
  * box-era movement out of the round-over-round flags.
  */
object Bench {

  /** BENCH-ONLY production-hash twins of the two heaviest shingle
    * scans: the registered q36/q76 stay on md5 (DuckDB reproduces it —
    * the oracle constraint), but the production deployment runs
    * xxhash64 (the `xx` flag; HashModeSpec pins mode equivalence on a
    * collision-free corpus), so the HEADLINE number for those scans
    * should be the production hash's, not the md5 tax. These are not
    * driver-registry queries — no oracle claims, benchable only.
    */
  private[graft] val benchOnly
      : Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
    "q36x_minhash_lsh_xx" -> ((s, d) =>
      graft.TextOps.minhashLsh(Tables.documents(s, d), "doc_id", "text",
        xx = true)),
    "q76x_winnow_containment_xx" -> ((s, d) =>
      graft.TextOps.containmentPairs(Tables.documents(s, d), "doc_id",
        "text", xx = true)),
    // the capped langid production twin: minDocGramCount = 2 drops
    // per-doc hapax trigrams after the partial aggregate — the spill
    // knob SCALING.md's corpus-scale probe motivates. The registered
    // q125 stays uncapped for oracle fidelity; this twin carries the
    // production number in the headline next to it
    "q125x_langid_capped" -> ((s, d) =>
      graft.CorpusOps.langIdTrigram(Tables.documents(s, d), "doc_id",
        "text", "lang", minDocGramCount = 2)),
    // r21 (VERDICT item 2): the CODE-INDEPENDENT drift control. The
    // published box_drift (median draw/anchored-floor over the fleet)
    // disagreed with the matched-query median by ~50% in r20, and the
    // r20 ADVICE's deeper point stands: any fleet-derived estimate is
    // contaminated by a uniform plan regression, because the fleet IS
    // the code under test. This row is pure Spark built-ins over
    // spark.range — no graft operator code, no input data — so its
    // round-over-round ratio moves ONLY with the box/JVM era. It is a
    // shuffle-shaped probe by design (64M rows hashed, partial-agg'd
    // and exchanged to 1M groups: the median headline row's shape).
    // BenchDiff normalizes by the MIN of this row's ratio and
    // box_drift — see BenchDiff.flag — so box drift can be divided out
    // without a uniform code regression forgiving itself.
    "q00x_drift_probe" -> ((s, _) => {
      import org.apache.spark.sql.functions._
      s.range(0, 64000000L, 1, 64)
        .select(pmod(xxhash64(col("id")), lit(1000000L)).as("k"),
          // bounded values: a sum of full-range xxhash64 longs
          // overflows int64 under ANSI mode
          pmod(xxhash64(col("id"), lit(1)), lit(1000000L)).as("v"))
        .groupBy("k")
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
    }))

  /** Every benchable query: the driver registry + the bench-only twins. */
  private[graft] def benchable
      : Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] =
    SparkEntry.queries ++ benchOnly

  /** The heavier, shuffle/join/window-shaped subset of the inventory. */
  def headline: Seq[String] =
    headline(sys.env.get("SPARK_GRAFT_BENCH_QUERIES"))

  /** [[headline]] with the subset request injectable (spec hook). */
  private[graft] def headline(subsetEnv: Option[String]): Seq[String] = {
    val preferred = Seq(
      // first row: the code-independent drift control (benchOnly; r21).
      // Exempt from rotation like q02 — a drift basis that sits rounds
      // out is no basis
      "q00x_drift_probe",
      "q02_pricing_summary", "q05_latest_per_group", "q10_join_agg",
      "q11_join_5way", "q14_self_join_dup", "q16_window_seq_id",
      "q17_topk_per_group", "q18_running_agg", "q28_merge_upsert",
      "q31_dedup_exact", "q36_minhash_lsh", "q37_ngram_jaccard",
      "q38_cosine_pairs", "q40_simhash", "q43_ann_ivf",
      "q01_monthly_counts", "q34_tfidf_keywords", "q55_source_profiles",
      "q58_queue_writeback", "q69_dup_clusters", "q70_simhash_dups",
      "q71_corpus_filter", "q72_ann_recall", "q73_dedup_recall",
      "q74_ivf_centroids", "q75_simhash_clusters",
      "q76_winnow_containment", "q77_split_report",
      "q78_split_leakage", "q79_asof_attribution", "q80_gap_sessions",
      "q81_corpus_rebalance", "q82_retention_cohorts",
      "q83_funnel_attribution", "q84_value_percentiles",
      "q85_event_transitions", "q86_value_percentiles_approx",
      "q87_range_windows", "q88_session_overlap", "q89_peak_concurrency",
      "q90_stratified_sample", "q91_retention_cohorts_approx",
      "q92_incremental_neardup", "q93_sequence_packing",
      "q94_decontaminate", "q95_repetition_stats",
      "q96_semantic_clusters", "q97_incremental_exact",
      "q101_pii_screen", "q102_paragraph_dedup", "q103_bigram_lm",
      "q104_bloom_exact", "q105_shard_plan", "q107_top_ngrams",
      "q108_sliding_rates", "q109_url_dedup", "q110_chunk_table",
      "q111_source_profile", "q114_scd2_history", "q115_time_travel",
      "q116_heavy_hitters", "q117_rate_anomaly",
      "q118_constraint_check", "q119_scd2_incremental",
      "q121_vocab_encode",
      // the production standing-index screens: each run times the full
      // registered lifecycle (bootstrap write + append + screen) — the
      // steady-state screen-only cost is the index-ab ScaleProbe's
      // subject; benching the registered form here makes the flagship
      // driver-visible instead of probe-only
      "q98_neardup_indexed", "q99_exact_indexed",
      // round-14: the full delete/compact lifecycle (bootstrap + append
      // + tombstone + three-table compaction + screen) — the takedown
      // maintenance cost, driver-visible like the q98/q99 ingest cost
      "q129_neardup_deleted", "q130_exact_deleted",
      // round-13 additions: synthesized-JPEG decode scan, BPE learn +
      // corpus encode
      "q122_jpeg_meta", "q123_bpe_merges", "q124_bpe_encode",
      "q125_langid_trigram", "q126_sq8_recall", "q127_semantic_decontam",
      "q128_bpe_packing",
      // round-14: synthesized-BMP pixel decode + dHash + banded
      // hamming near-dup (the image-content dedup path); IVF-PQ
      // codebook/reconstruction fidelity gate
      "q133_image_phash_dedup", "q134_pq_recall", "q135_pq_adc_recall",
      "q137_audio_features", "q138_audio_phash_dedup",
      "q139_video_frames", "q140_curation_manifest",
      "q141_embedding_drift",
      // round-14 second tranche: substring-span dedup (rolling-window
      // scan + one count shuffle), 10-round fixed-point PageRank
      // (iterative checkpoints — the only multi-job headline entry),
      // mixing planner (agg-only), hard-negative broadcast-probe scan
      "q142_substring_dedup", "q143_pagerank", "q144_source_mix",
      "q145_hard_negatives", "q146_dsir_select",
      // round-14 third tranche: the mix-plan EXECUTOR (two-level
      // per-source prefix sum) and 5-round label propagation (the
      // second iterative-checkpoint entry)
      "q147_mix_execute", "q148_label_prop",
      // round-14 fourth tranche: epoch-schedule packing (budget-
      // bounded copy explode), integer BM25 retrieval (query-term
      // broadcast onto the token explode), and canonical selection
      // over q69's clusters
      "q149_mix_pack", "q150_bm25_topk", "q151_canonical_docs",
      "q153_snapshot_diff", "q154_bm25_indexed",
      // round-14 fifth tranche: trained Lloyd k-means (bounded
      // centroid collects per round), SemDeDup over its clusters
      // (the within-cluster pair join), and the positional-index
      // lifecycle (build + takedown + compaction + phrase joins)
      "q155_kmeans", "q156_semdedup", "q157_phrase_search",
      "q158_systematic_sample",
      // round-14 sixth tranche: diff-driven BM25 index refresh
      // (bootstrap + delta ingest + search), the standing ANN index
      // lifecycle (mergeable-centroid build + takedown + compaction +
      // routed search), and its PQ-coded serving layout (codebook
      // train + codes log + ADC search)
      "q159_index_refresh", "q160_vector_index", "q162_pq_index",
      "q163_stats_refresh", "q164_retrieval_eval",
      "q165_phrase_snippets", "q166_fuzzy_vocab",
      // round-15 tranche: proximity retrieval over the positional
      // index (windowed m-way chains), phrase-aware ranking (BM25 +
      // boost before the cut), the learned-routing ANN index
      // (trained coarse quantizer + lifecycle + routed search), its
      // recall eval, and the learned-codeword PQ lifecycle
      "q167_proximity_search", "q168_proximity_ranked",
      "q169_learned_vector_index", "q170_learned_recall",
      "q171_learned_pq_index",
      // round-15 second tranche: the end-to-end curation composition
      // (quality ∩ canonical ∩ decontaminated → mix→pack) — the
      // full-text pipeline cost in one number — and the PNG pixel
      // decode gate (CRC-verified chunk walk + inflate + all-five
      // filter reconstruction, q133's sibling); q172/q175 (iterative
      // refresh lifecycles) and q173 (shard writer) are floor-table
      // entries like the other harness/writer shapes
      "q174_curation_pipeline", "q176_png_pixel_dedup",
      "q179_mulaw_features", "q180_png_rgb_dedup",
      "q181_cross_container_dedup",
      // diff-driven ANN refresh (bootstrap + diff + atomic batch +
      // routed search) — q159's posture for vectors
      "q177_vector_refresh",
      // round-16: drift-triggered quantizer re-training (two Lloyd
      // trainings + stale/re-routed search legs + brute-force eval),
      // warm-started dup-cluster refresh (two component loops over
      // the LSH pair path), and the baseline-JPEG cross-container
      // clique (entropy decode joins the pixel-hash dedup space)
      "q182_drift_reroute", "q183_clusters_refresh",
      "q184_jpeg_cross_container",
      // round-17: restart-interval + progressive JPEG entropy layouts,
      // palette-8 PNG joining the container-blind clique, and the
      // partial-compaction lifecycle (touched-bucket rewrite)
      "q185_jpeg_modes_dedup", "q186_palette_png_dedup",
      "q187_partial_compact", "q188_partial_dedup_compact",
      "q189_exif_meta", "q191_oriented_dedup",
      "q192_stars_clusters",
      // round-18: the PNG depth/interlace matrix (Adam7 + 16-bit +
      // 4-bit members joining the container-blind clique) and the
      // ISO-BMFF sample-table walk (Motion-JPEG decoded, avc1
      // honestly labeled)
      "q193_png_depths", "q194_mp4_samples",
      // round-18 second tranche: GIF joins the clique via real LZW;
      // alpha PNGs (types 4/6) join via white-compositing; TIFF joins
      // in both byte orders with scattered strips
      "q195_gif_lzw_dedup", "q196_png_alpha_dedup", "q197_tiff_dedup",
      "q198_gif_anim_frames", "q199_unicode_dedup",
      "q200_alaw_features", "q201_adpcm_features", "q202_media_census",
      "q203_mojibake_repair", "q204_hll_distinct", "q205_hll_merged",
      // round-19: the small-range (linear-counting) HLL regime —
      // per-type user_id sits below the 2.5m boundary at sf0.01
      "q206_hll_small_range",
      // production twins (benchOnly): xxhash64 for the heaviest
      // shingle scans, df-capped langid for the heaviest per-char scan
      "q36x_minhash_lsh_xx", "q76x_winnow_containment_xx",
      "q125x_langid_capped")
    // excluded by design, like the q66/q67 sink roundtrips: q120 (the
    // z-ordered WRITER — scan cost is measured above; the write path is
    // ZOrderSpec's subject) and q100/q106/q112/q113 (file-backed replay
    // harnesses whose cost is dominated by streaming-engine batch
    // bookkeeping, not executor-side plans)
    val available = preferred.filter(benchable.contains)
    val base =
      if (available.nonEmpty) available else benchable.keys.toSeq.sorted
    // SPARK_GRAFT_BENCH_QUERIES=q36_minhash_lsh,q69_dup_clusters benches a
    // subset in isolation — used to separate a query's own cost from
    // cache/ordering interplay with the rest of the headline sequence.
    subsetEnv match {
      case Some(list) =>
        val wanted = list.split(",").map(_.trim).filter(_.nonEmpty)
        // a typo must fail loudly, not yield an empty rc-0 bench run —
        // and any registry query is benchable, not just the headline set
        val unknown = wanted.filterNot(benchable.contains)
        require(unknown.isEmpty,
          s"SPARK_GRAFT_BENCH_QUERIES names not in the query registry: " +
            unknown.mkString(", "))
        wanted.distinct.toSeq
      case None => base
    }
  }

  /** Newest committed full-run snapshot (BENCH_OUT_r{N}.json) in `dir`
    * — the autodiff baseline. */
  private[graft] def newestSnapshot(
      dir: java.io.File = new java.io.File(".")): Option[(Int, String)] =
    committedSnapshots(dir, 1).headOption

  /** The newest `k` committed snapshots, newest first. */
  private[graft] def committedSnapshots(
      dir: java.io.File = new java.io.File("."),
      k: Int = 4): Seq[(Int, String)] = {
    val rx = "BENCH_OUT_r(\\d+)\\.json".r
    Option(dir.listFiles()).toSeq.flatten.flatMap(f => f.getName match {
      case rx(n) => Some((n.toInt, f.getName))
      case _ => None
    }).sortBy(-(_: (Int, String))._1).take(k)
  }

  /** Per-row anchored floor: the MIN over the last `k` committed
    * snapshots, not just the newest (r20 — ADVICE item 1 / VERDICT
    * item 3). The one-draw schedule made the newest snapshot an
    * upward-biased single cold draw; anchoring the deviation gate and
    * the diff prior to it let a 22.55 s q143 draw (ABA floor ~13 s)
    * ratchet itself in as next round's baseline. SIX snapshots, not
    * four: a single round can commit several full runs (r20 committed
    * three), so a 4-window can fill entirely with one box era — q143's
    * warm 13.07 s floor (r18) fell out of the 4-window the moment the
    * r21/r22 drifted-era snapshots landed; the 6-window spans at least
    * two eras.
    */
  private[graft] def anchoredMin(
      dir: java.io.File = new java.io.File("."),
      k: Int = 6): Map[String, Double] =
    committedSnapshots(dir, k).map { case (_, f) =>
      graft.tools.BenchDiff.mapOf(
        Files.readString(dir.toPath.resolve(f)), "queries")
        .filter(_._2 > 0)
    }.foldLeft(Map.empty[String, Double]) { (acc, m) =>
      m.foldLeft(acc) { case (a, (q, v)) =>
        a.updated(q, math.min(a.getOrElse(q, Double.MaxValue), v)) }
    }

  /** Per-row timed-iteration schedule (r19, rewritten r20 — VERDICT
    * item 1). r19's schedule (one draw only for tight-history rows
    * >= 0.5 s, min-of-2/3 elsewhere) still ran 338 draws / 1465 s of
    * timed wall and the driver invocation hit rc=124 for the second
    * consecutive round. r20: ANY row with a committed anchored floor
    * runs ONE draw — including the ~39 sub-half-second rows, whose
    * min-of-3 cost far more wall in 2.55×-min cold draws than their
    * ~14 s of mins suggested — for ~145 draws total. Only genuinely
    * NEW rows (no committed history) keep min-of-`iterations`. The
    * safety net is the drift-aware retry pass in [[main]]: after all
    * first draws, the run's box-drift factor is estimated as the
    * median draw/floor ratio, and rows whose draw exceeds 1.4× the
    * drift-adjusted floor re-time once (bounded set), publishing the
    * min — a session-context outlier recovers its level while a real
    * regression still publishes high and trips BenchDiff.
    *
    * Explicit overrides bypass the schedule entirely (r19 ADVICE): a
    * SPARK_GRAFT_BENCH_ITERS setting or a subset run
    * (SPARK_GRAFT_BENCH_QUERIES) is the adjudication re-measure case
    * where min-of-N is exactly what was asked for.
    */
  private[graft] def scheduledIters(name: String, iterations: Int,
      anchor: Map[String, Double], bypass: Boolean): Int =
    if (bypass || !anchor.contains(name)) iterations else 1

  /** Interleaved 1-based part slice for SPARK_GRAFT_BENCH_PART=i/n:
    * part i takes headline indexes i-1, i-1+n, i-1+2n, … Interleaving
    * spreads the heavy lifecycle rows across parts far more evenly
    * than a contiguous cut of the (roughly cost-sorted-by-accretion)
    * headline list, so each part fits the same per-invocation budget.
    */
  private[graft] def partSlice(names: Seq[String], part: Int,
      of: Int): Seq[String] = {
    require(of >= 1 && part >= 1 && part <= of,
      s"SPARK_GRAFT_BENCH_PART must be i/n with 1 <= i <= n, got $part/$of")
    names.zipWithIndex.collect { case (n, i) if i % of == part - 1 => n }
  }

  /** Every-other-round rotation for STABLE rows (r20 — the VERDICT's
    * remaining budget lever after the one-draw schedule still drew
    * 185 cold draws / 1686 s on a 2.4×-drifted box): a row whose
    * committed history is flat gets re-measured every OTHER round —
    * its cross-round estimator is the history, and BenchDiff still
    * sees it on the rounds it runs. Stability is judged on
    * DRIFT-NORMALIZED values (each snapshot value divided by its
    * snapshot's median — raw values move 2-3× with box era, together):
    * ≥ 2 appearances in the window whose normalized series stays
    * within 2× (cold one-draw snapshots inflate rows
    * HETEROGENEOUSLY — sub-second rows more than lifecycle gates — so
    * a tighter band mistakes cold-draw noise for instability: 1.5×
    * rotated only 38/145 on the r21 snapshot, 2× rotates 61).
    * Unstable rows, new rows, and the q02 drift control
    * always bench; explicit ITERS/subset runs bypass rotation like
    * the rest of the schedule, and SPARK_GRAFT_BENCH_ALL=1 forces a
    * full sweep. Halves alternate by name-hash parity against the
    * round index the run will snapshot as, so consecutive rounds
    * cover everything.
    */
  private[graft] def rotationSkips(
      dir: java.io.File = new java.io.File("."),
      k: Int = 4): Set[String] = {
    val snaps = committedSnapshots(dir, k)
    if (snaps.size < 3) return Set.empty
    val nextRound = snaps.head._1 + 1
    val maps = snaps.map { case (_, f) =>
      graft.tools.BenchDiff.mapOf(
        Files.readString(dir.toPath.resolve(f)), "queries")
        .filter(_._2 > 0)
    }.filter(_.nonEmpty)
    val norm = maps.map { m =>
      val vs = m.values.toSeq.sorted
      val med = vs(vs.size / 2)
      m.map { case (q, v) => q -> v / med }
    }
    norm.flatMap(_.keys).distinct.filter { q =>
      val series = norm.flatMap(_.get(q))
      q != "q02_pricing_summary" && q != "q00x_drift_probe" &&
        series.size >= 2 &&
        series.max / series.min <= 2.0 &&
        (q.## & 1) == (nextRound & 1)
    }.toSet
  }

  /** Box boot epoch (btime from /proc/stat) — the default part-run
    * session token: stable across invocations of one driver session on
    * one box, different across reboots and boxes. Empty when /proc is
    * unavailable (token check then degrades to the age guard). */
  private[graft] def bootToken: String =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().find(_.startsWith("btime "))
        .map(_.split("\\s+")(1)).getOrElse("")
      finally src.close()
    } catch { case _: Throwable => "" }

  /** Short git HEAD of the working tree, "" outside a repo — joined
    * into the default run token (r21, r20 ADVICE): a boot-epoch-only
    * token let part files produced by DIFFERENT CODE REVISIONS on the
    * same boot merge silently as one published run. Read from .git
    * directly (no subprocess — the bench must not depend on a git
    * binary). */
  private[graft] def gitHeadToken(dir: java.io.File =
      new java.io.File(".")): String =
    try {
      // .git may be a DIRECTORY (normal clone) or a gitdir-pointer
      // FILE (git worktree — the repo's own adjudication protocol
      // runs bench from worktrees, r21 review fix); worktree gitdirs
      // additionally keep refs in the commondir
      val dotGit = dir.toPath.resolve(".git")
      val gitDir =
        if (Files.isDirectory(dotGit)) dotGit
        else {
          val ptr = Files.readString(dotGit).trim
          require(ptr.startsWith("gitdir: "), s"unrecognized .git: $ptr")
          dir.toPath.resolve(ptr.drop(8).trim).normalize()
        }
      val commonDir = {
        val cd = gitDir.resolve("commondir")
        if (Files.exists(cd))
          gitDir.resolve(Files.readString(cd).trim).normalize()
        else gitDir
      }
      val head = Files.readString(gitDir.resolve("HEAD")).trim
      val sha =
        if (head.startsWith("ref: ")) {
          val ref = head.drop(5).trim
          Seq(gitDir.resolve(ref), commonDir.resolve(ref))
            .find(Files.exists(_))
            .map(p => Files.readString(p).trim)
            .getOrElse { // packed ref
              val packed = commonDir.resolve("packed-refs")
              if (!Files.exists(packed)) ""
              else Files.readAllLines(packed).toArray.map(_.toString)
                .find(_.endsWith(" " + ref))
                .map(_.split("\\s+")(0)).getOrElse("")
            }
        } else head
      if (sha.isEmpty)
        System.err.println("[bench] WARNING: could not resolve the git " +
          "HEAD — the run token degrades to the boot epoch and the " +
          "cross-revision part-merge guard is OFF for this run")
      sha.take(12)
    } catch {
      case _: Throwable =>
        System.err.println("[bench] WARNING: could not resolve the git " +
          "HEAD — the run token degrades to the boot epoch and the " +
          "cross-revision part-merge guard is OFF for this run")
        ""
    }

  /** Extract a JSON string field ("sf":"/root/...") — minimal sibling
    * of BenchDiff.mapOf. */
  private[graft] def strOf(json: String, key: String): Option[String] =
    ("\"" + key + "\"\\s*:\\s*\"([^\"]*)\"").r
      .findFirstMatchIn(json).map(_.group(1))

  /** Extract a JSON string array ("errors":["a","b"]) — sibling of
    * BenchDiff.mapOf, same deliberately-minimal posture. */
  private[graft] def listOf(json: String, key: String): Seq[String] =
    ("\"" + key + "\"\\s*:\\s*\\[([^\\]]*)\\]").r
      .findFirstMatchIn(json).toSeq.flatMap(m =>
        "\"([^\"]+)\"".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)

  private def fmtMap(m: Seq[(String, String)]): String =
    m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  /** Run BenchDiff against the newest committed snapshot and roll this
    * run's complete map forward as the next snapshot — the autodiff
    * tail shared by full runs and completed part merges. Skipped when
    * the run had errors (a failed run must never become the baseline).
    */
  private def diffAndSnapshot(outFile: String): Unit =
    newestSnapshot().foreach { case (n, prev) =>
      graft.tools.BenchDiff.main(Array(prev, outFile,
        s"BENCH_DIFF_r${n + 1}.json"))
      Files.copy(Paths.get(outFile),
        Paths.get(s"BENCH_OUT_r${n + 1}.json"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

  /** Merge completed part files into bench_out.json. Returns true only
    * when all `of` parts were present AND their union covers exactly
    * the full default headline — a stale part file from an older
    * headline shape refuses to merge rather than publishing a
    * silently-partial total. Part files are deleted after a successful
    * merge so they can never go stale for the next session.
    */
  private[graft] def mergeParts(of: Int): Boolean = {
    import graft.tools.BenchDiff.mapOf
    val paths = (1 to of).map(i => Paths.get(s"bench_out_part${i}of$of.json"))
    val present = paths.filter(Files.exists(_))
    if (present.size < of) {
      println(s"[bench] ${present.size}/$of part files present — " +
        "merge deferred to the final part's run")
      return false
    }
    val parts = paths.map(Files.readString(_))
    val queries = parts.map(mapOf(_, "queries")).reduce(_ ++ _)
    // the expected keyset must be derived the same way the part runs
    // derived theirs: SPARK_GRAFT_BENCH_ALL=1 / SPARK_GRAFT_BENCH_ITERS
    // part runs bench the FULL headline, so merging under those flags
    // must expect it too (review fix — the rotated keyset would refuse
    // their parts and silently discard the draws)
    val mergeSkipsRotation =
      sys.env.contains("SPARK_GRAFT_BENCH_ITERS") ||
        sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1")
    val full =
      if (mergeSkipsRotation) headline(None)
      else headline(None).filterNot(rotationSkips())
    if (queries.keySet != full.toSet) {
      System.err.println("[bench] part files do not union to the " +
        "current headline (stale parts from an older round?) — " +
        "refusing to merge")
      return false
    }
    // r20 (r19 ADVICE): parts must agree on the dataset AND the
    // session — draws from different SF dirs or different box
    // sessions must never blend into one published "run"
    val sfs = parts.map(strOf(_, "sf").getOrElse("?")).distinct
    if (sfs.size > 1) {
      System.err.println("[bench] part files ran against different " +
        s"sf dirs (${sfs.mkString(" vs ")}) — refusing to merge")
      return false
    }
    val tokens = parts.map(strOf(_, "run_token").getOrElse("")).distinct
    if (tokens.size > 1) {
      System.err.println("[bench] part files carry different session " +
        s"tokens (${tokens.mkString(" vs ")}: a leftover part from an " +
        "earlier session?) — refusing to merge")
      return false
    }
    val ageMs = paths.map(p =>
      System.currentTimeMillis() - Files.getLastModifiedTime(p).toMillis)
    if (ageMs.exists(_ > 6L * 3600 * 1000)) {
      System.err.println("[bench] a part file is older than 6 h — " +
        "refusing to merge across box-days; delete stale parts and rerun")
      return false
    }
    val spreads = parts.map(mapOf(_, "spread_pct")).reduce(_ ++ _)
    val draws = parts.map(mapOf(_, "draws")).reduce(_ ++ _)
    val errors = parts.flatMap(listOf(_, "errors")).distinct
    val iters = parts.flatMap("\"iters\"\\s*:\\s*(\\d+)".r
        .findFirstMatchIn(_).map(_.group(1).toInt))
      .reduceOption(_ max _).getOrElse(3)
    val sf = sfs.head
    // merged drift = the max over parts: the retry gate already
    // normalized within each part; the consumer wants the worst case
    val mergedDrift = parts.flatMap(
      "\"box_drift\"\\s*:\\s*(-?[0-9.]+)".r.findFirstMatchIn(_)
        .map(_.group(1).toDouble)).reduceOption(_ max _).getOrElse(1.0)
    val total = queries.values.filter(_ >= 0).sum
    def ordered[A](m: Map[String, A], fmt: A => String) =
      fmtMap(full.filter(m.contains).map(k => k -> fmt(m(k))))
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${
        ordered[Double](queries, v => f"$v%.3f")},"spread_pct":${
        ordered[Double](spreads, v => f"$v%.1f")},"spread_min_pct":0,"iters":$iters,"box_drift":$mergedDrift%.2f,"draws":${
        ordered[Double](draws, v => f"${v.toInt}%d")},"merged_parts":$of,"errors":$errJson,"sf":"$sf"}"""
    Files.writeString(Paths.get("bench_out.json"), json + "\n")
    println(json)
    println(s"[bench] merged $of parts -> bench_out.json " +
      f"(total $total%.1f s, ${queries.size} rows, ${errors.size} errors)")
    if (errors.isEmpty) diffAndSnapshot("bench_out.json")
    paths.foreach(Files.deleteIfExists(_))
    true
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // r19 (VERDICT item 1b): fresh per-run warehouse. A long session
    // accretes standing-index tables (242 at the r18 tail) and every
    // lifecycle gate's bootstrap then pays ~20% catalog/listing
    // overhead (SCALING.md's q154 worktree measurement) — a harness
    // artifact a deployment never pays, since nothing re-bootstraps
    // per query there. The bench must measure the plan, not the
    // accretion.
    val wh = Files.createTempDirectory("graft-bench-wh").toString
    TmpDirs.deleteOnExit(wh)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-bench", cpus)
      .config("spark.sql.warehouse.dir", wh).getOrCreate()
    // ERROR, not WARN: the driver keeps only a bounded output tail and
    // WARN-class spam (WindowExec bounded-frame notes, Column equality
    // heuristics) has pushed the one metric JSON line out of the
    // capture window in EVERY round to date (BENCH_r19's entire tail
    // is Column WARNs) — parsed:null even on rc=0 rounds
    spark.sparkContext.setLogLevel("ERROR")

    // SPARK_GRAFT_BENCH_PART=i/n (r19, VERDICT item 1c): bench the i-th
    // interleaved slice of the full headline, write a part file, and
    // auto-merge once all parts exist. Orthogonal to the subset hook —
    // combining them has no coherent merge semantics, so refuse.
    val partSpec = sys.env.get("SPARK_GRAFT_BENCH_PART").map { s =>
      val m = "(\\d+)\\s*/\\s*(\\d+)".r.findFirstMatchIn(s.trim).getOrElse(
        sys.error(s"SPARK_GRAFT_BENCH_PART must look like 1/2, got '$s'"))
      (m.group(1).toInt, m.group(2).toInt)
    }
    require(partSpec.isEmpty ||
        sys.env.get("SPARK_GRAFT_BENCH_QUERIES").isEmpty,
      "SPARK_GRAFT_BENCH_PART and SPARK_GRAFT_BENCH_QUERIES are exclusive")
    // rotation applies BEFORE part slicing so parts stay consistent
    // with mergeParts' keyset guard (both derive from the committed
    // snapshots, which don't change between part invocations)
    val skipRotation = sys.env.contains("SPARK_GRAFT_BENCH_ITERS") ||
      sys.env.contains("SPARK_GRAFT_BENCH_QUERIES") ||
      sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1")
    val rotatedOut = if (skipRotation) Set.empty[String] else rotationSkips()
    if (rotatedOut.nonEmpty)
      println(s"[bench] rotation: ${rotatedOut.size} stable rows sit " +
        "this round out (their cross-round estimator is the committed " +
        "history; SPARK_GRAFT_BENCH_ALL=1 forces a full sweep)")
    val benched = headline.filterNot(rotatedOut)
    val names = partSpec match {
      case Some((i, n)) => partSlice(benched, i, n)
      case None => benched
    }

    // committed history → per-row anchored floor (min over the last 6
    // committed snapshots — see anchoredMin's ratchet rationale) for
    // the iteration schedule and the drift-aware retry gate
    val anchor = anchoredMin()

    // Untimed warmup at the smallest scale. r19 finding: warming EVERY
    // headline row cost ~1700 s of the 2533 s wall (each lifecycle
    // gate pays its fixed bootstrap/manifest cost nearly in full even
    // at sf0.001) while the timed phase was ~800 s — the warmup, not
    // the iterations, was the driver-cap killer. What warmup actually
    // buys is SHARED state (JIT tiers, codegen infra, parquet reader,
    // session machinery), so a ~12-row FAMILY set covering the
    // distinct code paths warms it at ~5% of the cost. Per-query
    // residual cold cost (plan codegen, first index bootstrap) lands
    // in the timed draws, where min-of-N absorbs it and one-draw rows
    // have the 1.4x deviation gate: a cold-inflated draw re-times
    // once and publishes the warm minimum. Subset runs keep the warm-
    // what-you-bench behavior (they are small by construction).
    val warmFamilies = Seq(
      "q00x_drift_probe",      // the drift control must measure WARM
      "q02_pricing_summary",   // scan + agg + parse expressions
      "q11_join_5way",         // broadcast/shuffle joins
      "q16_window_seq_id",     // window functions
      "q36_minhash_lsh",       // shingle/LSH HOF pipelines
      "q84_value_percentiles", // sketch/percentile aggs
      "q93_sequence_packing",  // two-level prefix sums
      "q98_neardup_indexed",   // standing-index lifecycle machinery
      "q122_jpeg_meta",        // decoder UDFs
      "q143_pagerank",         // iterative checkpoint loops
      "q150_bm25_topk",        // token explode + rank tail
      "q155_kmeans",           // vector/centroid path
      "q204_hll_distinct")     // register-sketch chain
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) {
      val t0 = System.nanoTime()
      val warmSet =
        if (sys.env.contains("SPARK_GRAFT_BENCH_QUERIES")) names
        else warmFamilies.filter(benchable.contains)
      warmSet.foreach { name =>
        try benchable(name)(spark, warmDir)
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        finally Caches.clear()
      }
      println(f"[bench] warmup: ${warmSet.size} queries in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val timedT0 = System.nanoTime()
    var errors = List.empty[String]
    // Min of N timed iterations: single-run timings swing ±15% (and
    // occasionally 2-3×) with system noise on this box — see SCALING.md's
    // noise characterization; the min is the stable estimate of what the
    // plan actually costs (same methodology as JMH's min-time mode).
    // N is scheduled per row (scheduledIters) from the committed history.
    val iterations = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    // explicit overrides bypass the history schedule (r19 ADVICE): an
    // ITERS setting or a subset run is the adjudication re-measure
    // case where min-of-N is exactly what was asked for
    val bypass = sys.env.contains("SPARK_GRAFT_BENCH_ITERS") ||
      sys.env.contains("SPARK_GRAFT_BENCH_QUERIES")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        benchable(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          if (!errors.contains(name)) errors ::= name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
      } finally Caches.clear() // don't carry cached blocks across queries
    }
    // Spread-gated re-run (r15, gate tightened r17: 150% → 80%; r19:
    // ONE extra draw — on a drifted box more extras re-measure the
    // same jitter): a multi-draw row whose best-N spread exceeds the
    // gate re-times once and records only the N fastest samples, so a
    // one-off system-noise outlier (GC pause, page-cache eviction)
    // drops out instead of poisoning the published spread. The min is
    // unchanged by trimming. Methodology in SCALING.md's noise section.
    def trimmedSpread(ts: Seq[Double]): Double = {
      val b = ts.sorted.take(iterations)
      (b.max / b.min - 1) * 100
    }
    var results = names.map { name =>
      val sched = scheduledIters(name, iterations, anchor, bypass)
      var times = (1 to sched).map(_ => once(name))
      var extra = 0
      while (times.length > 1 && times.forall(_ >= 0) && extra < 1 &&
          trimmedSpread(times) > 80.0) {
        times = times :+ once(name)
        extra += 1
      }
      (name, times.length, times)
    }
    // Drift-aware retry pass (r20): estimate the run's box-drift
    // factor as the MEDIAN draw/floor ratio over anchored rows, then
    // re-time once the rows whose draw exceeds 1.4× the drift-adjusted
    // floor. The retry set is HYBRID (review fix): every over-gate row
    // with a sub-second floor retries (each retry costs ~a second, and
    // an unretried 5× draw on a small row would later trip BenchDiff's
    // 1.6× one-draw gate as a false regression), while expensive rows
    // are capped at 16 ordered by ABSOLUTE excess seconds over the
    // adjusted floor — a 23-s-over q143 distorts the published map
    // more than ten 0.3 s rows at 5×, and the cap keeps a pathological
    // box-day from inflating the wall. A uniform-drift box retries
    // almost nothing (the median soaks it up); a session-context
    // outlier like r19's q143 22.55 s-vs-13 s floor retries and
    // publishes its real level; a genuine regression re-times high
    // and still trips BenchDiff.
    val ratios = results.flatMap { case (k, _, t) =>
      if (t.forall(_ >= 0)) anchor.get(k).map(t.min / _) else None }
    val drift = if (ratios.isEmpty) 1.0
      else ratios.sorted.apply(ratios.size / 2)
    if (!bypass) {
      val gate = 1.4 * math.max(1.0, math.min(drift, 2.0))
      val overGate = results.collect {
        case (k, _, t) if t.forall(_ >= 0) &&
            anchor.get(k).exists(a => t.min > a * gate) =>
          (k, anchor(k), t.min - anchor(k) * gate)
      }
      val retry = (overGate.collect { case (k, a, _) if a < 1.0 => k } ++
        overGate.filter(_._2 >= 1.0).sortBy(-_._3).take(16).map(_._1))
        .toSet
      if (retry.nonEmpty) {
        println(f"[bench] drift ${drift}%.2fx; retrying ${retry.size} " +
          s"rows over ${math.round(gate * 100) / 100.0}x their floor")
        results = results.map {
          case (k, n, t) if retry.contains(k) =>
            val r = once(k)
            // a retry failure on a row whose first draw succeeded is
            // timing noise, not a correctness error — keep the draw
            if (r < 0) { errors = errors.filterNot(_ == k); (k, n + 1, t) }
            else (k, n + 1, t :+ r)
          case r => r
        }
      }
    }
    // draws = the TRUE number of timed executions (the published
    // sample list trims to the best N — recording its length instead
    // would hide the re-time cost from wall forensics)
    val published = results.map { case (k, n, t) =>
      (k, n, if (t.exists(_ < 0)) Seq(-1.0) else t.sorted.take(iterations))
    }
    val qs = published.map { case (k, _, t) =>
      "\"" + k + f"\":${t.min}%.3f" }.mkString("{", ",", "}")
    // per-query spread (max/min − 1, %) across the timed iterations: the
    // published noise band — a round-over-round delta smaller than the
    // spread is measurement, not engineering
    def spreadJson(minPct: Double): String = published.collect {
      case (k, _, t) if t.min > 0 &&
          (t.max / t.min - 1) * 100 >= minPct =>
        "\"" + k + f"\":${(t.max / t.min - 1) * 100}%.1f"
    }.mkString("{", ",", "}")
    // actual timed draws per row — a spread of 0.0 from one scheduled
    // draw and from three coincidentally-equal draws read very
    // differently in adjudication; file channel only
    val drawsJson = fmtMap(published.map { case (k, n, _) =>
      k -> n.toString })
    val errJson = errors.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = published.map(_._3.min).filter(_ >= 0).sum
    // the part-run session token (r19 ADVICE): parts only merge when
    // every part carries the same token, so a leftover part file from
    // a crashed earlier session can't blend into this run's artifact.
    // The driver sets no env, so the default token is the box boot
    // epoch PLUS the git HEAD (r21): same-session same-revision parts
    // share it; a part from a previous boot, another box, or another
    // code revision refuses.
    val runToken = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUN",
      bootToken + "-" + gitHeadToken())
    // spread_min_pct is self-describing: a consumer comparing the stdout
    // line against bench_out.json can tell a FILTERED spread map (only
    // entries >= the stated floor) from a complete one
    def json(spread: String, spreadMinPct: Double,
        withDraws: Boolean): String =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"spread_pct":$spread,"spread_min_pct":$spreadMinPct%.0f,"iters":$iterations,"box_drift":$drift%.2f,${
        if (withDraws) "\"draws\":" + drawsJson + "," else ""}${
        partSpec.map { case (i, n) =>
          s""""part":"$i/$n","run_token":"$runToken",""" }
          .getOrElse("")}"errors":$errJson,"sf":"$sfDir"}"""
    println(f"[bench] timed phase: ${published.map(_._2).sum} " +
      f"draws in ${(System.nanoTime() - timedT0) / 1e9}%.1f s")
    // stdout must survive a bounded tail-capture window (round 10's
    // artifact was cut mid-line): print the spread only where it is
    // signal (≥25%); the complete spread map goes to bench_out.json.
    println(json(spreadJson(25.0), 25, withDraws = false))
    partSpec match {
      case Some((i, n)) =>
        Files.writeString(Paths.get(s"bench_out_part${i}of$n.json"),
          json(spreadJson(0.0), 0, withDraws = true) + "\n")
        mergeParts(n): Unit
      case None =>
        Files.writeString(Paths.get("bench_out.json"),
          json(spreadJson(0.0), 0, withDraws = true) + "\n")
        // regression autodiff, wired into every FULL bench run (the r16
        // verdict gap: the tool existed but its artifact was never
        // produced): diff against the newest committed BENCH_OUT_r{N}
        // snapshot, write BENCH_DIFF_r{N+1}.json (empty `flagged` is
        // the pass) AND snapshot this run's complete map as
        // BENCH_OUT_r{N+1}.json so the next round diffs against it
        // (the driver's BENCH_r{N}.json keeps only a truncated stdout
        // tail — r16's full map was lost exactly that way). Subset
        // runs (SPARK_GRAFT_BENCH_QUERIES) neither diff nor snapshot;
        // neither does a run with errors — errored queries report -1
        // timings, and a failed run silently becoming the baseline
        // would poison every later diff.
        if (sys.env.get("SPARK_GRAFT_BENCH_QUERIES").isEmpty &&
            errors.isEmpty)
          diffAndSnapshot("bench_out.json")
    }
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
