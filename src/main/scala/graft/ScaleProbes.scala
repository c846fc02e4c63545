package graft

import org.apache.spark.sql.functions._

/** SCALING.md measurement probes — the harness behind the rows the
  * headline bench can't produce (planted graphs, physical-layout A/Bs).
  * Each mode prints one human-readable result line; the numbers are
  * recorded in SCALING.md at the commit that ran them, min-of-3 like
  * the main bench.
  *
  * Modes (first arg):
  *  - `components [spokes] [pathLen]` — the giant-component worst case
  *    for [[TextOps.components]]: ONE component shaped star(spokes) +
  *    path(pathLen), the skew boilerplate-heavy web corpora actually
  *    produce (a giant near-dup cluster plus stragglers). Reports
  *    rounds + wall seconds; rounds must stay ~log2(diameter) or the
  *    pointer jump is broken and the large-star/small-star fallback is
  *    due.
  *  - `bucketed-merge [sfDir]` — the q28 MERGE with both sides read
  *    from url-bucketed tables (the zero-exchange sort-merge layout
  *    BucketingSpec pins) vs the plain shuffled form: the number behind
  *    the 100 TB co-location claim. The one-time bucketed WRITE is
  *    reported separately — at production scale the canonical table is
  *    maintained bucketed, so steady-state merges pay only the read.
  *  - `index-ab [sfDir]` — the q92-rebuild vs q98-table-screen A/B:
  *    what the DISK-resident bucketed dedup index (DedupIndex) saves a
  *    daily increment over re-hashing the standing corpus per run.
  *  - `compaction-ab [sfDir] [gens]` — the small-file law behind
  *    DedupIndex.compact: exact-screen latency after 1/8/`gens`
  *    append generations (same rows, more files) and again after
  *    compaction, plus the compaction wall time.
  *  - `merge-skew [sfDir] [hotCopies]` — AQE skew-join split measured
  *    on the MERGE full-outer (the one fact-to-fact shuffle in the ETL
  *    path): a planted hot url on the incoming side vs the same run
  *    with skewJoin disabled.
  *  - `semdecon-ab [nCorpus]` — q127's eval-broadcast vs forced
  *    shuffle-fallback A/B at a synthetic corpus 200× the sf0.1
  *    embeddings table.
  */
object ScaleProbes {

  /** Min of three timed iterations, `Caches.clear()` run UNTIMED between
    * them — cache-release cost is session hygiene, not plan cost, so it
    * stays out of the reported seconds (same posture as graft.Bench).
    */
  private def minOf3(body: => Unit): Double =
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      Caches.clear()
      sec
    }.min

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("graft-scale-probes")
    args.headOption.getOrElse("components") match {

      case "components" =>
        val spokes = args.lift(1).map(_.toInt).getOrElse(200000)
        val pathLen = args.lift(2).map(_.toInt).getOrElse(16384)
        // distributed edge synthesis: star center 0 → spokes 1..S, path
        // S..S+L chained; diameter = pathLen + 2
        val star = spark.range(1, spokes + 1L)
          .select(lit(0L).as("src"), col("id").as("dst"))
        val path = spark.range(spokes, spokes + pathLen.toLong)
          .select(col("id").as("src"), (col("id") + 1).as("dst"))
        val e = star.unionByName(path)
        val adj = e.unionByName(
          e.select(col("dst").as("src"), col("src").as("dst")))
        val n = spokes + pathLen + 1
        var rounds = -1
        val sec = minOf3 {
          val (labels, r) = TextOps.componentsIters(adj, maxIters = 40)
          rounds = r
          // every vertex present AND on the component min — a silently
          // dropped row would otherwise pass the wrong==0 check
          val (total, wrong) = {
            val agg = labels.agg(count(lit(1)),
              sum(when(col("comp") =!= 0L, 1L).otherwise(0L))).head()
            (agg.getLong(0), agg.getLong(1))
          }
          require(total == n, s"label table has $total vertices, expected $n")
          require(wrong == 0, s"$wrong vertices off the component min")
        }
        println(f"[probe] components: vertices=$n edges=${spokes + pathLen} " +
          f"diameter=${pathLen + 2} rounds=$rounds min3_sec=$sec%.2f")

      case "stars-ab" =>
        // min-label propagation vs large-star/small-star on the same
        // giant component (star + long path) — the r17 fallback's
        // growth-law record for SCALING.md: rounds AND wall-clock at
        // probe scale, where propagation's pointer-jump self-join
        // funnels the whole component through one label partition
        val spokes = args.lift(1).map(_.toInt).getOrElse(200000)
        val pathLen = args.lift(2).map(_.toInt).getOrElse(16384)
        val star = spark.range(1, spokes + 1L)
          .select(lit(0L).as("src"), col("id").as("dst"))
        val path = spark.range(spokes, spokes + pathLen.toLong)
          .select(col("id").as("src"), (col("id") + 1).as("dst"))
        val e = star.unionByName(path)
        val adj = e.unionByName(
          e.select(col("dst").as("src"), col("src").as("dst")))
        val n = spokes + pathLen + 1
        def check(labels: org.apache.spark.sql.DataFrame): Unit = {
          val agg = labels.agg(count(lit(1)),
            sum(when(col("comp") =!= 0L, 1L).otherwise(0L))).head()
          require(agg.getLong(0) == n,
            s"label table has ${agg.getLong(0)} vertices, expected $n")
          require(agg.getLong(1) == 0,
            s"${agg.getLong(1)} vertices off the component min")
        }
        var rProp = -1
        val secProp = minOf3 {
          val (labels, r) = TextOps.componentsIters(adj, maxIters = 40)
          rProp = r
          check(labels)
        }
        var rStars = -1
        val secStars = minOf3 {
          val (labels, r) =
            TextOps.componentsStarsIters(adj, maxIters = 40)
          rStars = r
          check(labels)
        }
        println(f"[probe] stars-ab: vertices=$n diameter=${pathLen + 2} " +
          f"prop_rounds=$rProp prop_min3_sec=$secProp%.2f " +
          f"stars_rounds=$rStars stars_min3_sec=$secStars%.2f")

      case "partial-ab" =>
        // full vs PARTIAL compaction after a narrow takedown — the r17
        // law: partial cost must track the takedown, not the corpus.
        // One-shot write timings, so both arms get an UNTIMED warm
        // lifecycle first and each timed arm is min-of-2 (the r14e/
        // r15a lesson); the index is rebuilt fresh per timing because
        // compaction consumes its input generation.
        val sfDir = args.lift(1).getOrElse(
          sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
        val nDel = args.lift(2).map(_.toInt).getOrElse(5)
        val rep = args.lift(3).map(_.toInt).getOrElse(1)
        // bucket count (r18): the touched-share law needs deployment-
        // sized counts — at 32 a 5-doc takedown's 16 bands touch half
        // the band table; at 256+ the share drops ∝ 1/buckets
        val nBuckets = args.lift(4).map(_.toInt)
          .getOrElse(graft.sources.DedupIndex.Buckets)
        // replication > 1: scale the corpus by cross-joining with a
        // range and offsetting ids — PARQUET-BACKED first (the r15a-ab
        // lesson: inline synthesis re-pays generation per pass and
        // poisons A/B write timings)
        val docs =
          if (rep <= 1) graft.Tables.documents(spark, sfDir)
          else {
            val p = "/tmp/graft_pab_corpus_" + rep + "_" +
              ProcessHandle.current().pid()
            graft.Tables.documents(spark, sfDir)
              .crossJoin(spark.range(rep).select(col("id").as("r")))
              .select((col("doc_id") + col("r") * 10000000L).as("doc_id"),
                col("text"))
              .write.mode("overwrite").parquet(p)
            graft.TmpDirs.deleteOnExit(p)
            spark.read.parquet(p)
          }
        val victims = docs.orderBy("doc_id").limit(nDel)
          .select("doc_id", "text")
        def build(pfx: String): Unit = {
          graft.sources.DedupIndex.write(docs, "doc_id", "text", pfx,
            buckets = nBuckets)
          graft.sources.DedupIndex.delete(victims, "doc_id", "text", pfx)
        }
        // warm both arms untimed
        build("pab_w"); graft.sources.DedupIndex.compact(spark, "pab_w")
        Caches.clear()
        build("pab_x")
        graft.sources.DedupIndex.compactPartial(spark, "pab_x")
        Caches.clear()
        def twice(body: => Unit): Unit =
          (1 to 2).foreach { _ => body; Caches.clear() }
        var full = Double.MaxValue
        var part = Double.MaxValue
        var touched: Map[String, Int] = Map.empty
        twice {
          // rebuild outside the clock: time ONLY the maintenance pass
          build("pab_f")
          val t0 = System.nanoTime()
          graft.sources.DedupIndex.compact(spark, "pab_f")
          full = math.min(full, (System.nanoTime() - t0) / 1e9)
        }
        twice {
          build("pab_p")
          val t0 = System.nanoTime()
          touched = graft.sources.DedupIndex.compactPartial(spark, "pab_p")
          part = math.min(part, (System.nanoTime() - t0) / 1e9)
        }
        val n = docs.count()
        println(f"[probe] partial-ab: corpus=$n deleted=$nDel " +
          f"buckets=$nBuckets touched=$touched full_min2_sec=$full%.2f " +
          f"partial_min2_sec=$part%.2f ratio=${full / part}%.2f")

      case "bucketed-merge" =>
        val sfDir = args.lift(1).getOrElse(
          sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
        val cur = EtlQueries.currentListings(spark, sfDir)
        val inc = EtlQueries.incomingListings(spark, sfDir)
        def runMerge(c: org.apache.spark.sql.DataFrame,
                     i: org.apache.spark.sql.DataFrame): Unit =
          Merge.merge(c, i, EtlQueries.asOf)
            .write.format("noop").mode("overwrite").save()
        // warm once (JIT + codegen), then time the plain shuffled form
        runMerge(cur, inc)
        val shuffled = minOf3(runMerge(cur, inc))
        // one-time physical layout: both sides bucketed by the join key —
        // the full-outer SMJ then needs no Exchange on either side (the
        // claim the require pins; Spark elides the SMJ Sort only when
        // every bucket is a single sorted file, which this probe does
        // not assert)
        spark.sql("DROP TABLE IF EXISTS probe_cur_b")
        spark.sql("DROP TABLE IF EXISTS probe_inc_b")
        try {
          val t0 = System.nanoTime()
          cur.write.mode("overwrite").bucketBy(32, "url").sortBy("url")
            .saveAsTable("probe_cur_b")
          inc.write.mode("overwrite").bucketBy(32, "url").sortBy("url")
            .saveAsTable("probe_inc_b")
          val writeSec = (System.nanoTime() - t0) / 1e9
          val curB = spark.table("probe_cur_b")
          val incB = spark.table("probe_inc_b")
          val plan = Merge.merge(curB, incB, EtlQueries.asOf)
            .queryExecution.executedPlan.toString
          require(!plan.contains("Exchange hashpartitioning(url"),
            s"bucketed merge still shuffles on url:\n$plan")
          val bucketed = minOf3(runMerge(curB, incB))
          println(f"[probe] bucketed-merge: sf=$sfDir shuffled_min3_sec=" +
            f"$shuffled%.2f bucketed_min3_sec=$bucketed%.2f " +
            f"one_time_bucket_write_sec=$writeSec%.2f")
        } finally {
          spark.sql("DROP TABLE IF EXISTS probe_cur_b")
          spark.sql("DROP TABLE IF EXISTS probe_inc_b")
        }

      case "graph-ab" =>
        // r21: the iterative-loop join strategy behind Graph.BcastMaxN —
        // per-round broadcast of the vertex-state frame (ranks/labels)
        // vs the default shuffle plan, on the registered q143/q148
        // shapes. GraphSpec pins the two arms bit-equal (integer-exact
        // sums are join-strategy-independent); this measures them.
        val sfDir = args.lift(1).getOrElse(
          sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
        def run(bcastMaxN: Long, lp: Boolean): Unit = {
          val (nodes, edges) = graft.Graph.tradeGraph(spark, sfDir)
          val out =
            if (lp) graft.Graph.labelProp(nodes, edges,
              bcastMaxN = bcastMaxN)
            else graft.Graph.pageRank(nodes, edges, bcastMaxN = bcastMaxN)
          out.write.format("noop").mode("overwrite").save()
          Caches.clear()
        }
        run(Long.MaxValue, lp = false) // warm (JIT + codegen) once
        val prB = minOf3(run(Long.MaxValue, lp = false))
        run(0L, lp = false)
        val prS = minOf3(run(0L, lp = false))
        run(Long.MaxValue, lp = true)
        val lpB = minOf3(run(Long.MaxValue, lp = true))
        run(0L, lp = true)
        val lpS = minOf3(run(0L, lp = true))
        println(f"[probe] graph-ab: sf=$sfDir " +
          f"pagerank_bcast_min3_sec=$prB%.2f " +
          f"pagerank_shuffle_min3_sec=$prS%.2f " +
          f"labelprop_bcast_min3_sec=$lpB%.2f " +
          f"labelprop_shuffle_min3_sec=$lpS%.2f")

      case "ngram-ab" =>
        // the dense-vs-sparse trade ngramJaccardBest's scaladoc cites:
        // block self-join + native intersect vs inverted shingle index
        // (NgramVariantSpec pins them bit-equal; this measures them)
        val sfDir = args.lift(1).getOrElse(
          sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
        val docs = Tables.documents(spark, sfDir)
        def run(inverted: Boolean): Unit = {
          val out =
            if (inverted) TextOps.ngramJaccardBestInverted(
              docs, "doc_id", "text", Seq("lang", "source"))
            else TextOps.ngramJaccardBest(
              docs, "doc_id", "text", Seq("lang", "source"))
          out.write.format("noop").mode("overwrite").save()
          Caches.clear()
        }
        run(inverted = false) // warm (JIT + codegen) once
        val selfJoin = minOf3(run(inverted = false))
        run(inverted = true)
        val inverted = minOf3(run(inverted = true))
        println(f"[probe] ngram-ab: sf=$sfDir selfjoin_min3_sec=" +
          f"$selfJoin%.2f inverted_min3_sec=$inverted%.2f")

      case "asof-ab" =>
        // the trade Temporal.asOfJoin's scaladoc cites: union-tag +
        // running-last (ONE hash shuffle, rows ∝ input) vs the naive
        // range join (equi on user + ts inequality → per-user candidate
        // cross product, then rank-1). Verified bit-equal once untimed,
        // then both timed min-of-3 on the q79 shape.
        // `asof-ab [sfDir]` probes the q79 shape on real testdata;
        // `asof-ab synth <users> <perUser>` plants DEEP per-user
        // histories (alternating view/click) to expose the growth law:
        // range-join candidates ≈ users × (perUser/2 clicks ×
        // perUser/4 prior views) — quadratic in history depth — while
        // the union form stays linear in events.
        val (label, ev) =
          if (args.lift(1).contains("synth")) {
            val users = args.lift(2).map(_.toInt).getOrElse(500)
            val perUser = args.lift(3).map(_.toInt).getOrElse(200)
            (s"synth users=$users perUser=$perUser",
              spark.range(users.toLong * perUser).select(
                col("id").as("event_id"),
                (col("id") / perUser).cast("long").as("user_id"),
                timestamp_micros((col("id") % perUser) * 1000000L).as("ts"),
                when(col("id") % 2 === 0, "view").otherwise("click")
                  .as("event_type")))
          } else {
            val sfDir = args.lift(1).getOrElse(
              sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
            (s"sf=$sfDir", Tables.events(spark, sfDir))
          }
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
            col("ts").as("v_ts"))
        // both forms break (user, ts) ties on max view_id — without the
        // matching tiebreaks the bit-equality require below could fail
        // spuriously on tied view timestamps in real testdata (r9 ADVICE)
        def unionForm = Temporal
          .asOfJoin(clicks, views.select(col("view_id"),
            col("v_user").as("user_id"), col("v_ts").as("ts")),
            "user_id", "ts", "ts", Seq("click_id"), Seq("view_id"),
            rightTie = Some("view_id"))
          .select(col("click_id"), col("user_id"),
            col("asof.view_id").as("view_id"))
        def rangeForm = {
          import org.apache.spark.sql.expressions.Window
          clicks.join(views, col("user_id") === col("v_user") &&
              col("ts") >= col("v_ts"), "left_outer")
            .withColumn("rn", row_number().over(Window
              .partitionBy("click_id").orderBy(col("v_ts").desc_nulls_last,
                col("view_id").desc_nulls_last)))
            .filter(col("rn") === 1)
            .select(col("click_id"), col("user_id"), col("view_id"))
        }
        require(unionForm.exceptAll(rangeForm).isEmpty &&
          rangeForm.exceptAll(unionForm).isEmpty,
          "asof union form and range-join form disagree")
        Caches.clear()
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        noop(unionForm); noop(rangeForm) // warm both (JIT + codegen)
        val unionSec = minOf3(noop(unionForm))
        val rangeSec = minOf3(noop(rangeForm))
        println(f"[probe] asof-ab: $label union_min3_sec=$unionSec%.2f " +
          f"rangejoin_min3_sec=$rangeSec%.2f")

      case "containment-ab" =>
        // the md5 "oracle tax" on the heaviest scan in the headline:
        // q76's winnowed-containment fingerprints hash every character
        // 8-gram, so the digest choice multiplies the whole scan. md5 is
        // what the DuckDB oracle can reproduce; the `xx` flag (xxhash64,
        // HashModeSpec pins kernel parity) is the production escape.
        val sfDir = args.lift(1).getOrElse(
          sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
        val docs = Tables.documents(spark, sfDir)
        def runC(xx: Boolean): Unit = {
          TextOps.containmentPairs(docs, "doc_id", "text", xx = xx)
            .write.format("noop").mode("overwrite").save()
          Caches.clear()
        }
        runC(xx = false) // warm (JIT + codegen) once
        val md5Sec = minOf3(runC(xx = false))
        runC(xx = true)
        val xxSec = minOf3(runC(xx = true))
        println(f"[probe] containment-ab: sf=$sfDir md5_min3_sec=" +
          f"$md5Sec%.2f xxhash_min3_sec=$xxSec%.2f " +
          f"speedup=${md5Sec / xxSec}%.2fx")

      case "streaming-asof" =>
        // throughput of the streaming as-of (flatMapGroupsWithState,
        // one tiny newest-view record per user): one bulk micro-batch
        // of a planted alternating view/click timeline. users is forced
        // ODD so each user's event ids alternate parity → every user
        // both updates state and emits attributions. Every click emits
        // exactly one row (matched or not), so completion is the sink
        // holding n/2 rows; NoTimeout state means processAllAvailable
        // suffices (unlike the neardup probe's timeout loop).
        // Optional third arg: number of sequential micro-batches. 1 =
        // the bulk-ingest ceiling; >1 = the SUSTAINED rate, each batch
        // paying its own planning/state-store-commit cost — the number
        // a continuously-running attribution deployment actually gets.
        val n = args.lift(1).map(_.toInt).getOrElse(200000)
        val batches = args.lift(2).map(_.toInt).getOrElse(1)
        import spark.implicits._
        implicit val sq = spark.sqlContext
        val users = math.max(1, n / 200) | 1
        val expected = n / 2 // odd event ids are clicks
        def onceA(): Unit = {
          val in = org.apache.spark.sql.execution.streaming.runtime
            .MemoryStream[graft.streaming.EventStreams.TypedEvent]
          val q = graft.streaming.EventStreams.streamingAsOf(in.toDS())
            .writeStream.format("memory").queryName("probe_sasof")
            .outputMode("append").start()
          try {
            // chunk bounds keep event-time order ACROSS batches (state
            // correctness doesn't need it, but it mirrors a live feed)
            for (b <- 0 until batches) {
              val lo = (n.toLong * b / batches).toInt
              val hi = (n.toLong * (b + 1) / batches).toInt
              in.addData((lo until hi).map { i =>
                graft.streaming.EventStreams.TypedEvent(i.toLong,
                  (i % users).toLong,
                  new java.sql.Timestamp(i.toLong * 1000L),
                  if (i % 2 == 0) "view" else "click")
              })
              q.processAllAvailable()
            }
            val got = spark.table("probe_sasof").count()
            require(got == expected,
              s"expected $expected attributions, sink has $got")
          } finally {
            q.stop()
            spark.sql("DROP TABLE IF EXISTS probe_sasof")
          }
        }
        onceA() // warm: state-store init, codegen, JIT
        val asec = minOf3(onceA())
        println(f"[probe] streaming-asof: events=$n batches=$batches " +
          f"attributions=$expected min3_sec=$asec%.2f " +
          f"events_per_sec=${n / asec}%.0f")

      case "range-ab" =>
        // the nested-loop cliff behind q87: Spark plans a pure
        // inequality join as BroadcastNestedLoopJoin (every point
        // against every interval, |P|×|I| comparisons), while
        // Temporal.rangeJoin's bin-replication rewrite runs a hash
        // equi-join on the 5-minute bin whose candidate count tracks
        // true temporal overlap. Planted timeline: prime-stride
        // positions over a 30-day span, 300 s windows, bin = window
        // length (replication ≤ 2 rows per interval).
        val nPts = args.lift(1).map(_.toInt).getOrElse(200000)
        val nIv = args.lift(2).map(_.toInt).getOrElse(2000)
        val winUs = 300L * 1000000
        val spanUs = 30L * 86400 * 1000000
        val pts = spark.range(nPts).select(col("id").as("pid"),
          timestamp_micros((col("id") * 2654435761L) % spanUs).as("t"))
        val iv = spark.range(nIv).select(col("id").as("iid"),
          timestamp_micros((col("id") * 7919000003L) % (spanUs - winUs))
            .as("s"))
        val iv2 = iv.withColumn("e",
          timestamp_micros(unix_micros(col("s")) + winUs))
        def binned = Temporal.rangeJoin(pts, "t", iv2, "s", "e", winUs)
          .select("pid", "iid")
        def nested = pts.join(iv2,
            col("t") >= col("s") && col("t") < col("e"))
          .select("pid", "iid")
        // the A/B is only meaningful if the two forms really take the
        // two plans being compared
        val nPlan = nested.queryExecution.executedPlan.toString
        require(nPlan.contains("BroadcastNestedLoopJoin"),
          s"naive form no longer nested-loops:\n$nPlan")
        val bPlan = binned.queryExecution.executedPlan.toString
        require(!bPlan.contains("BroadcastNestedLoopJoin") &&
          !bPlan.contains("CartesianProduct"),
          s"binned form grew a nested loop:\n$bPlan")
        require(binned.exceptAll(nested).isEmpty &&
          nested.exceptAll(binned).isEmpty,
          "binned range join and nested-loop form disagree")
        Caches.clear()
        def noopR(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        noopR(binned); noopR(nested) // warm both (JIT + codegen)
        val binnedSec = minOf3(noopR(binned))
        val nestedSec = minOf3(noopR(nested))
        println(f"[probe] range-ab: points=$nPts intervals=$nIv " +
          f"binned_min3_sec=$binnedSec%.2f nestedloop_min3_sec=" +
          f"$nestedSec%.2f speedup=${nestedSec / binnedSec}%.2fx")

      case "incremental-ab" =>
        // the law behind q92: when an increment arrives, a FULL re-dedup
        // re-pairs the whole corpus (cost ∝ |corpus| signatures + all
        // bucket collisions). The incremental screen has two arms:
        // REBUILD (the registered query's shape — testdata is one
        // table, so the old side's shingle sets are recomputed each
        // run) and STANDING (the production steady state — the old
        // corpus index is already persisted, so an increment pays only
        // its own hashing plus the asymmetric probe). Same 20% batch
        // definition as the registered query.
        val sfDir = args.lift(1).getOrElse(
          sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
        val docs = Tables.documents(spark, sfDir)
        val isNew = col("doc_id") % 5 === 4
        def shOf(d: org.apache.spark.sql.DataFrame) =
          d.select(col("doc_id"),
            TextOps.hashedShingleSet(col("text")).as("shset"))
        def noopW(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        def full(): Unit = noopW(TextOps.minhashLsh(docs, "doc_id", "text"))
        def rebuild(): Unit = noopW(TextOps.incrementalNearDup(docs,
          "doc_id", "text", isNew))
        // the standing index persists OUTSIDE the Caches registry so the
        // untimed per-iteration Caches.clear() can't drop it
        val oldSh = shOf(docs.filter(!isNew)).persist()
        oldSh.count() // materialize untimed — index maintenance, not probe cost
        def standing(): Unit = {
          // the increment's OWN hashing is steady-state cost, so it
          // stays inside the timing — but persisted, so it runs ONCE,
          // not once per consumer (bands + verify side + spine)
          val newSh = shOf(docs.filter(isNew)).persist()
          try {
            newSh.count()
            noopW(TextOps.incrementalNearDupFrom(oldSh, newSh, 0.8))
          } finally newSh.unpersist()
        }
        try {
          full(); Caches.clear(); rebuild(); Caches.clear()
          standing(); Caches.clear() // warm all three
          val fullSec = minOf3(full())
          val rebuildSec = minOf3(rebuild())
          val standingSec = minOf3(standing())
          println(f"[probe] incremental-ab: sf=$sfDir " +
            f"full_rededup_min3_sec=$fullSec%.2f " +
            f"incremental_rebuild_min3_sec=$rebuildSec%.2f " +
            f"incremental_standing_min3_sec=$standingSec%.2f " +
            f"standing_speedup=${fullSec / standingSec}%.2fx")
        } finally oldSh.unpersist()

      case "index-ab" =>
        // the production lifecycle behind q98/q99: the standing index
        // lives in BUCKETED TABLES on disk across job runs — no
        // JVM-resident cache to lose between daily ingests (the
        // incremental-ab probe's standing arm assumes one). A/B: the
        // registered rebuild form (q92 re-hashes the 80% old side per
        // run) vs the table-backed screen (DedupIndex.screenNearDup —
        // the increment pays its own hashing + the asymmetric probe;
        // the corpus side is READ, bucketed, zero exchange). The
        // one-time index write is reported separately: maintenance
        // cost amortized across every later increment.
        val sfDir = args.lift(1).getOrElse(
          sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
        val docs = Tables.documents(spark, sfDir)
        val isNew = col("doc_id") % 5 === 4
        def noopW(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        def rebuild(): Unit = noopW(TextOps.incrementalNearDup(docs,
          "doc_id", "text", isNew))
        def screen(): Unit = noopW(graft.sources.DedupIndex.screenNearDup(
          spark, docs.filter(isNew), "doc_id", "text", "probeidx"))
        val t0 = System.nanoTime()
        graft.sources.DedupIndex.write(docs.filter(!isNew), "doc_id",
          "text", "probeidx")
        Caches.clear() // the write's internal projection is maintenance
        val writeSec = (System.nanoTime() - t0) / 1e9
        rebuild(); Caches.clear(); screen(); Caches.clear() // warm both
        val rebuildSec = minOf3(rebuild())
        val screenSec = minOf3(screen())
        println(f"[probe] index-ab: sf=$sfDir " +
          f"rebuild_min3_sec=$rebuildSec%.2f " +
          f"table_screen_min3_sec=$screenSec%.2f " +
          f"one_time_index_write_sec=$writeSec%.2f " +
          f"screen_speedup=${rebuildSec / screenSec}%.2fx")

      case "compaction-ab" =>
        // the small-file law behind DedupIndex.compact (r14): a daily
        // ingest appends one file per bucket per batch, so a year of
        // ingests reads 365 generations per bucket at every screen.
        // Measure the exact-screen latency after 1, 8 and 32 append
        // generations (the increment re-split into G slices so total
        // row count is IDENTICAL across arms — only the file count
        // varies), then compact and re-measure: the delta is the
        // listing + footer + merge-read tax compaction reclaims, and
        // the compaction wall time is the maintenance price paid once
        // per window.
        val sfDir = args.lift(1).getOrElse(
          sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
        val gens = args.lift(2).map(_.toInt).getOrElse(32)
        val docs = Tables.documents(spark, sfDir)
        val isNew = col("doc_id") % 5 === 4
        val standing = docs.filter(!isNew)
        def noopW(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        def screen(prefix: String): Unit =
          noopW(graft.sources.DedupIndex.screenExact(
            spark, docs.filter(isNew), "doc_id", "text", prefix))
        def build(prefix: String, g: Int): Unit = {
          // same rows every arm: slice the standing side into g
          // generation batches by doc_id residue
          graft.sources.DedupIndex.write(
            standing.filter(pmod(col("doc_id"), lit(g)) === 0),
            "doc_id", "text", prefix)
          for (i <- 1 until g) {
            graft.sources.DedupIndex.append(
              standing.filter(pmod(col("doc_id"), lit(g)) === i),
              "doc_id", "text", prefix)
            Caches.clear()
          }
        }
        def files(prefix: String): Int = {
          // resolve through the session's warehouse path, not a
          // cwd-relative literal (r14 review finding), and through the
          // generation manifest (compaction rewrites into the next
          // generation's physical table); guard the listing against a
          // missing dir
          val loc = new java.io.File(new java.net.URI(
            new org.apache.hadoop.fs.Path(
              spark.sessionState.conf.warehousePath,
              graft.sources.Generations.physicalFor(spark, prefix,
                "hashes")).toString).getPath)
          Option(loc.listFiles())
            .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
        }
        val out = Seq(1, math.min(8, gens), gens).distinct.map { g =>
          val p = s"probecmp$g"
          build(p, g); Caches.clear()
          val nf = files(p)
          screen(p) // warm
          val s1 = minOf3(screen(p))
          val t0 = System.nanoTime()
          graft.sources.DedupIndex.compact(spark, p)
          val compactSec = (System.nanoTime() - t0) / 1e9
          val nfc = files(p)
          screen(p) // warm the compacted layout
          val s2 = minOf3(screen(p))
          f"gens=$g files=$nf screen_min3_sec=$s1%.2f " +
            f"compact_sec=$compactSec%.2f files_after=$nfc " +
            f"screen_after_min3_sec=$s2%.2f tax=${s1 / s2}%.2fx"
        }
        out.foreach(l => println(s"[probe] compaction-ab: sf=$sfDir $l"))

      case "merge-skew" =>
        // the q28 MERGE's skew posture, MEASURED instead of asserted —
        // and the measurement corrects the assertion. Planting a hot
        // url on the incoming side (the duplicate-scrape pathology: one
        // listing re-submitted en masse, so the full-outer SMJ
        // partition holding that url's cogroup dwarfs the rest) shows
        // that AQE's skew-join split NEVER fires here: Spark's
        // OptimizeSkewedJoin can split inner/semi/anti and the
        // non-preserved side of one-sided outers, but a FULL OUTER
        // join preserves BOTH sides, so neither side is splittable and
        // the GraftSession skewJoin flag is inert for the merge. The
        // probe pins that fact (skew=true absent even at thresholds
        // scaled to the probe's data), then measures the engine's REAL
        // skew defense for this join: the url-unique input contract —
        // frontier dedup upstream collapses the hot key to one row, so
        // a contract-enforced merge shuffle CANNOT concentrate by key.
        // Hot rows vary SOURCE so the downstream reid window spreads;
        // the delta isolates the join-side straggler.
        val sfDir = args.lift(1).getOrElse(
          sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
        val hotCopies = args.lift(2).map(_.toLong).getOrElse(200000L)
        val cur = EtlQueries.currentListings(spark, sfDir)
        val incBase = EtlQueries.incomingListings(spark, sfDir)
        // deterministic seed row — limit(1) without an order is
        // plan-dependent and made the planted-skew measurement
        // unreproducible across runs/partitionings
        val hot = incBase.orderBy("url").limit(1)
          .crossJoin(spark.range(hotCopies))
          .withColumn("url", lit("https://hot.example/listing-0"))
          .withColumn("source",
            concat(lit("s"), pmod(col("id"), lit(50L))))
          .drop("id")
        val incHot = incBase.unionByName(hot)
        val incDeduped = incHot.dropDuplicates("url")
        def runMerge(i: org.apache.spark.sql.DataFrame): Unit =
          Merge.merge(cur, i, EtlQueries.asOf)
            .write.format("noop").mode("overwrite").save()
        // pin the limitation at thresholds the probe's data CAN trip:
        // even then the full-outer plans no skew=true split
        val olds = Seq(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes")
          .map(k => k -> spark.conf.getOption(k))
        spark.conf.set(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          "2MB")
        spark.conf.set(
          "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
        try {
          val df = Merge.merge(cur, incHot, EtlQueries.asOf)
          // drive THIS QueryExecution (df.write would build a new one
          // whose adaptive plan finalizes invisibly to df)
          df.queryExecution.toRdd.count()
          val plan = df.queryExecution.executedPlan.toString
          require(plan.contains("isFinalPlan=true"), "plan not final")
          require(!plan.contains("skew=true"),
            "full-outer skew split fired — Spark grew the capability; " +
              "re-evaluate this probe and the merge scaladoc")
          Caches.clear()
        } finally olds.foreach {
          // restore BEFORE timing: the scaled thresholds exist only to
          // give the pin a fair chance to fire — timing under a 1 MB
          // advisory size would coalesce the shuffle into hundreds of
          // tiny partitions and measure a config no deployment runs
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
        runMerge(incHot); Caches.clear() // warm
        val hotSec = minOf3(runMerge(incHot))
        runMerge(incDeduped); Caches.clear() // warm
        val dedupSec = minOf3(runMerge(incDeduped))
        println(f"[probe] merge-skew: sf=$sfDir hot=$hotCopies " +
          f"aqe_split_fired=false hot_merge_min3_sec=$hotSec%.2f " +
          f"contract_deduped_min3_sec=$dedupSec%.2f " +
          f"dedup_speedup=${hotSec / dedupSec}%.2fx")

      case "semdecon-ab" =>
        // q127's asymmetry, measured at scale the 2k-vector sf0.1
        // table can't show: the 4% eval side broadcasts (zero corpus
        // shuffle before the bucket join) vs the size-gate's fallback
        // arm (maxBroadcastBytes=0 forces the plain shuffled join).
        // Both arms are bit-equal by construction — asserted both
        // directions before timing, the bloom-ab discipline.
        val nCorpus = args.lift(1).map(_.toLong).getOrElse(400000L)
        val emb = spark.range(nCorpus).select(col("id").as("vec_id"),
          array((0 until 64).map { i =>
            (((col("id") * 2654435761L + i * 40503L) % 1000003L) % 200L
              - 100L).cast("float") / lit(50.0f)
          }: _*).as("embedding"))
        val isEval = col("vec_id") % 25 === 0
        def run(gate: Long): org.apache.spark.sql.DataFrame =
          Similarity.semanticDecontaminate(emb, "vec_id", "embedding",
            isEval, threshold = 0.2, maxBroadcastBytes = gate)
        def noopW(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        val missing = run(64L << 20).exceptAll(run(0L)).count()
        val extra = run(0L).exceptAll(run(64L << 20)).count()
        Caches.clear()
        require(missing == 0 && extra == 0,
          s"fallback arm diverged: $missing missing, $extra extra rows")
        noopW(run(64L << 20)); Caches.clear() // warm
        val bcast = minOf3(noopW(run(64L << 20)))
        noopW(run(0L)); Caches.clear() // warm
        val shuffled = minOf3(noopW(run(0L)))
        println(f"[probe] semdecon-ab: corpus=$nCorpus " +
          f"broadcast_min3_sec=$bcast%.2f " +
          f"shuffle_fallback_min3_sec=$shuffled%.2f " +
          f"broadcast_speedup=${shuffled / bcast}%.2fx")

      case "bloom-ab" =>
        // the law behind q104: at real ingest asymmetry (standing
        // corpus >> increment) the plain incremental screen pays a
        // groupBy shuffle over EVERY standing hash just to answer
        // membership for a day's worth — the bloom prefilter (built
        // over the increment, broadcast to the corpus scan) drops the
        // standing side to true-matches + fpp·|corpus| BEFORE the
        // exchange. The registered q104 runs at the testdata's 80/20
        // ratio where the filter can't show; this probe runs the
        // 100:1 shape. Both arms must stay bit-equal (asserted once,
        // untimed).
        val nOld = args.lift(1).map(_.toLong).getOrElse(2000000L)
        val nInc = args.lift(2).map(_.toLong).getOrElse(20000L)
        val docs = spark.range(nOld + nInc).select(
          col("id").as("doc_id"),
          // every 10th increment doc duplicates standing doc (id-nOld)
          when(col("id") >= nOld && col("id") % 10 === 0,
            concat(lit("text "), (col("id") - nOld).cast("string")))
            .otherwise(concat(lit("text "), col("id").cast("string")))
            .as("text"))
        val isNew = col("doc_id") >= nOld
        def noopW(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        def plain(): Unit = noopW(
          TextOps.incrementalExactDedup(docs, "doc_id", "text", isNew))
        def bloom(): Unit = noopW(
          CorpusOps.bloomExactScreen(docs, "doc_id", "text", isNew))
        // bit-equality asserted in BOTH directions (matching the
        // union-form and binned probes): a one-sided exceptAll misses
        // extra rows on the bloom arm
        val plainRows = TextOps.incrementalExactDedup(docs, "doc_id",
          "text", isNew)
        val bloomRows = CorpusOps.bloomExactScreen(docs, "doc_id",
          "text", isNew)
        val missing = plainRows.exceptAll(bloomRows).count()
        val extra = bloomRows.exceptAll(plainRows).count()
        Caches.clear()
        require(missing == 0 && extra == 0,
          s"bloom screen diverged: $missing missing, $extra extra rows")
        plain(); Caches.clear(); bloom(); Caches.clear() // warm both
        val plainSec = minOf3(plain())
        val bloomSec = minOf3(bloom())
        println(f"[probe] bloom-ab: old=$nOld inc=$nInc " +
          f"plain_min3_sec=$plainSec%.2f bloom_min3_sec=$bloomSec%.2f " +
          f"bloom_speedup=${plainSec / bloomSec}%.2fx")

      case "corpus-scale" =>
        // growth-law receipt for the late-r12 corpus tranche: the
        // sf0.1 documents table is 5k docs — this synthesizes 100k /
        // 200k / 400k docs (~30 tokens each, 8-word vocabulary with
        // every 9th doc a boilerplate repeat, so chunk/bigram
        // collisions are dense like real web text) and times
        // paragraphDedup, bigramLmScore and vocabEncode at each size.
        // Near-doubling times across doublings = the operators are in
        // their linear regime; the fixed stage floor shows at the
        // smallest size.
        val sizes = args.drop(1).map(_.toLong) match {
          case a if a.nonEmpty => a.toSeq
          case _ => Seq(100000L, 200000L, 400000L)
        }
        def synth(n: Long) = spark.range(n).select(col("id").as("doc_id"),
          when(col("id") % 9 === 0,
            concat_ws(" ", (0 until 30).map(_ => lit("alpha")): _*))
            .otherwise(concat_ws(" ", (0 until 30).map { i =>
              element_at(
                array(Seq("alpha", "beta", "gamma", "delta", "eps",
                  "zeta", "eta", "theta").map(lit): _*),
                (pmod(col("id") * 31 + i * 7, lit(8)) + 1).cast("int"))
            }: _*))
            .as("text"))
        def noopW(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        // warm at the smallest size
        val w0 = synth(10000L)
        noopW(CorpusOps.paragraphDedup(w0, "doc_id", "text")); Caches.clear()
        noopW(CorpusOps.bigramLmScore(w0, "doc_id", "text")); Caches.clear()
        noopW(CorpusOps.vocabEncode(w0, "doc_id", "text")); Caches.clear()
        for (n <- sizes) {
          val d = synth(n)
          // lang label for the classifier: deterministic 5-way split
          val dl = d.withColumn("lang",
            concat(lit("l"), pmod(col("doc_id"), lit(5L))))
          val para = minOf3(noopW(CorpusOps.paragraphDedup(d, "doc_id", "text")))
          val lm = minOf3(noopW(CorpusOps.bigramLmScore(d, "doc_id", "text")))
          val voc = minOf3(noopW(CorpusOps.vocabEncode(d, "doc_id", "text")))
          val bpe = minOf3(noopW(Bpe.encodeCorpus(d, "doc_id", "text",
            merges = 12)))
          val lid = minOf3(noopW(CorpusOps.langIdTrigram(dl, "doc_id",
            "text", "lang")))
          // the df-cap knob arm: hapax trigrams dropped map-side
          val lidCap = minOf3(noopW(CorpusOps.langIdTrigram(dl, "doc_id",
            "text", "lang", minDocGramCount = 2)))
          println(f"[probe] corpus-scale: docs=$n " +
            f"paragraph_dedup_min3_sec=$para%.2f " +
            f"bigram_lm_min3_sec=$lm%.2f vocab_encode_min3_sec=$voc%.2f " +
            f"bpe_encode_min3_sec=$bpe%.2f langid_min3_sec=$lid%.2f " +
            f"langid_dfcap2_min3_sec=$lidCap%.2f")
        }

      case "r14b-scale" =>
        // growth-law receipt for the round-14 second tranche:
        // substringDedup + dsirSelect over the corpus-scale synthetic
        // text (every 9th doc a boilerplate repeat → dense duplicate
        // windows, like real web text), and 10-round pageRank over a
        // synthesized 8-out-degree graph at doubling vertex counts.
        // Near-doubling times across doublings = linear regime.
        val sizes = args.drop(1).map(_.toLong) match {
          case a if a.nonEmpty => a.toSeq
          case _ => Seq(100000L, 200000L, 400000L)
        }
        def synthD(n: Long) = spark.range(n)
          .select(col("id").as("doc_id"),
            when(col("id") % 9 === 0,
              concat_ws(" ", (0 until 30).map(_ => lit("alpha")): _*))
              .otherwise(concat_ws(" ", (0 until 30).map { i =>
                element_at(
                  array(Seq("alpha", "beta", "gamma", "delta", "eps",
                    "zeta", "eta", "theta").map(lit): _*),
                  (pmod(col("id") * 31 + i * 7, lit(8)) + 1).cast("int"))
              }: _*)).as("text"))
        def synthG(nodes: Long) = {
          val vs = spark.range(nodes)
            .select(concat(lit("n"), col("id")).as("node"))
          val es = spark.range(nodes * 8).select(
            concat(lit("n"), col("id") % nodes).as("src"),
            concat(lit("n"), (col("id") * 7 + 3) % nodes).as("dst"),
            (col("id") % 5 + 1).as("w"))
          (vs, es)
        }
        def noopW(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        val w0 = synthD(10000L)
        noopW(CorpusOps.substringDedup(w0, "doc_id", "text")); Caches.clear()
        noopW(CorpusOps.dsirSelect(w0, "doc_id", "text",
          col("doc_id") % 10 < 2)); Caches.clear()
        val (wv, we) = synthG(10000L)
        noopW(Graph.pageRank(wv, we, iters = 2)); Caches.clear()
        for (n <- sizes) {
          val d = synthD(n)
          val sub = minOf3(noopW(
            CorpusOps.substringDedup(d, "doc_id", "text")))
          val dsir = minOf3(noopW(CorpusOps.dsirSelect(d, "doc_id",
            "text", col("doc_id") % 10 < 2)))
          val (vs, es) = synthG(n)
          val pr = minOf3(noopW(Graph.pageRank(vs, es)))
          println(f"[probe] r14b-scale: n=$n " +
            f"substring_dedup_min3_sec=$sub%.2f " +
            f"dsir_select_min3_sec=$dsir%.2f " +
            f"pagerank10_min3_sec=$pr%.2f")
        }

      case "r14c-scale" =>
        // growth-law receipt for the round-14 fourth tranche: BM25
        // (query-term broadcast onto the token explode — expect the
        // corpus-linear regime) and mixPack at a FIXED 1M-token budget
        // (the copy expansion is budget-bounded, so only the one
        // corpus scan + per-source prefix should grow — the designed
        // "cost follows the budget, not the corpus" shape).
        // canonicalPerCluster is deliberately NOT probed on this
        // synthetic: its every-9th-doc boilerplate makes one giant
        // all-identical clique, whose C(n,2) verified pairs are the
        // LSH worst case LshSkewSpec pins at small n — the operator's
        // cost law is q69's (ngram-ab / planted-graph probes), plus
        // one join and a top-1 window.
        val sizes = args.drop(1).map(_.toLong) match {
          case a if a.nonEmpty => a.toSeq
          case _ => Seq(100000L, 200000L, 400000L)
        }
        def synthD(n: Long) = spark.range(n)
          .select(col("id").as("doc_id"),
            when(col("id") % 9 === 0,
              concat_ws(" ", (0 until 30).map(_ => lit("alpha")): _*))
              .otherwise(concat_ws(" ", (0 until 30).map { i =>
                element_at(
                  array(Seq("alpha", "beta", "gamma", "delta", "eps",
                    "zeta", "eta", "theta").map(lit): _*),
                  (pmod(col("id") * 31 + i * 7, lit(8)) + 1).cast("int"))
              }: _*)).as("text"),
            concat(lit("s"), col("id") % 10).as("source"))
        def noopW(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        val qs = Seq(("q1", "alpha beta"), ("q2", "gamma delta eps"),
          ("q3", "zeta zzz"))
        val w0 = synthD(10000L)
        noopW(CorpusOps.bm25TopK(w0, "doc_id", "text", qs)); Caches.clear()
        noopW(CorpusOps.mixPack(w0, "doc_id", "text", "source"))
        Caches.clear()
        for (n <- sizes) {
          val d = synthD(n)
          val bm = minOf3(noopW(
            CorpusOps.bm25TopK(d, "doc_id", "text", qs)))
          val mp = minOf3(noopW(
            CorpusOps.mixPack(d, "doc_id", "text", "source")))
          println(f"[probe] r14c-scale: n=$n bm25_min3_sec=$bm%.2f " +
            f"mixpack_budget1m_min3_sec=$mp%.2f")
        }

      case "r14d-scale" =>
        // growth-law receipt for the round-14 fifth tranche over
        // synthetic 64-dim integer-noise embeddings (within-corpus
        // cosines ~N(0, 1/64), so τ=0.3 admits a thin pair tail —
        // realistic selectivity, the bm25-ab lesson):
        //  - kmeansClusters at doubling n, fixed k=8 (the operator's
        //    contract is COARSE clustering — cost should be linear:
        //    per round one scan + one k×dim-bounded shuffle);
        //  - semDedup at fixed n across k=4/16/64 — the 1/k law on
        //    the within-cluster pair join (the paper's mitigation:
        //    cluster count grows with the corpus; beyond the literal-
        //    argmin's O(100)-centroid codegen bound the assignment
        //    becomes the IVF centroid-table broadcast join, pair
        //    stage unchanged);
        //  - systematicSample at doubling n (linear: one scalar agg +
        //    two-level prefix + row-local arithmetic).
        val sizes = args.drop(1).map(_.toLong) match {
          case a if a.nonEmpty => a.toSeq
          case _ => Seq(50000L, 100000L, 200000L)
        }
        def synthE(n: Long) = spark.range(n)
          .select(col("id").as("vec_id"),
            transform(sequence(lit(0), lit(63)),
              d => ((pmod(col("id") * 31 + d * 7, lit(201)) - 100)
                .cast("double") / 100.0).cast("float")).as("embedding"),
            (col("id") % 10).cast("int").as("label"))
        def synthD(n: Long) = spark.range(n)
          .select(col("id").as("doc_id"),
            concat_ws(" ", (0 until 30).map { i =>
              element_at(
                array(Seq("alpha", "beta", "gamma", "delta", "eps",
                  "zeta", "eta", "theta").map(lit): _*),
                (pmod(col("id") * 31 + i * 7, lit(8)) + 1).cast("int"))
            }: _*).as("text"))
        def noopW(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        noopW(Similarity.kmeansClusters(synthE(5000L), "vec_id",
          "embedding", "label", k = 8)); Caches.clear()
        noopW(CorpusOps.systematicSample(synthD(5000L), "doc_id",
          "text", 100)); Caches.clear()
        for (n <- sizes) {
          val e = synthE(n)
          val km = minOf3(noopW(Similarity.kmeansClusters(e, "vec_id",
            "embedding", "label", k = 8)))
          val ss = minOf3(noopW(CorpusOps.systematicSample(synthD(n),
            "doc_id", "text", 1000)))
          println(f"[probe] r14d-scale: n=$n kmeans8_min3_sec=$km%.2f " +
            f"systematic_sample_min3_sec=$ss%.2f")
        }
        val semN = 20000L
        for (k <- Seq(4, 16, 64)) {
          val sd = minOf3(noopW(Similarity.semDedup(synthE(semN),
            "vec_id", "embedding", "label", k = k, iters = 2)))
          println(f"[probe] r14d-scale: semdedup n=$semN k=$k " +
            f"min3_sec=$sd%.2f")
        }

      case "r14e-ab" =>
        // the sixth-tranche laws. (a) refresh-ab: diff-driven index
        // refresh cost follows the DELTA, never the corpus — vs the
        // full re-ingest that produces the same index. (b) vecidx-ab:
        // the standing vector index's routed search vs the inline
        // ivfTopK, which pays the full-corpus quantize + centroid
        // aggregation per probe batch (the bm25-ab posture for
        // vectors). Block count grows with the corpus at fixed ~500
        // vectors/block — the real IVF posture, so the standing arm's
        // pushed routed-block predicate has realistic selectivity.
        val nRef = args.lift(1).map(_.toLong).getOrElse(200000L)
        // 10k-word vocabulary (the bm25-ab selectivity lesson)
        def synthDoc(n: Long) = spark.range(n).select(
          col("id").as("doc_id"),
          concat_ws(" ", transform(sequence(lit(0), lit(29)),
            i => concat(lit("w"),
              pmod(col("id") * 31 + i * 7, lit(10000))))).as("text"))
        val base = synthDoc(nRef)
        def gen2(denom: Int) = base.withColumn("text",
          when(pmod(col("doc_id"), lit(denom)) === 0,
            concat(col("text"), lit(" rev2")))
            .otherwise(col("text")))
        def timed(body: => Unit): Double = {
          val t0 = System.nanoTime(); body
          val s = (System.nanoTime() - t0) / 1e9; Caches.clear(); s
        }
        // untimed warm passes for BOTH arms — a cold first-action
        // write pays plan codegen+JIT and draws 2.5x high (measured)
        graft.sources.Bm25Index.write(gen2(64), "doc_id", "text",
          "abr_full")
        Caches.clear()
        val fullSec = timed(graft.sources.Bm25Index.write(
          gen2(64), "doc_id", "text", "abr_full"))
        graft.sources.Bm25Index.write(base, "doc_id", "text", "abr_inc")
        Caches.clear()
        timed(graft.sources.Bm25Index.refreshFromDiff(base, gen2(64),
          "doc_id", "text", "abr_inc"))
        for (denom <- Seq(64, 16, 4)) {
          graft.sources.Bm25Index.write(base, "doc_id", "text",
            "abr_inc")
          Caches.clear()
          val s = timed(graft.sources.Bm25Index.refreshFromDiff(
            base, gen2(denom), "doc_id", "text", "abr_inc"))
          println(f"[probe] r14e-ab: refresh n=$nRef delta=1/$denom " +
            f"refresh_sec=$s%.2f full_reingest_sec=$fullSec%.2f")
        }
        def synthV(n: Long, blocks: Int) = spark.range(n).select(
          col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)),
            d => ((pmod(col("id") * 31 + d * 7, lit(201)) - 100)
              .cast("double") / 100.0).cast("float")).as("embedding"),
          pmod(col("id"), lit(blocks)).cast("int").as("label"))
        def noopV(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        for (nn <- Seq(50000L, 100000L, 200000L)) {
          val blocks = (nn / 500).toInt
          val e = synthV(nn, blocks)
          val probeF = pmod(col("vec_id"), lit(nn / 100)) === 0
          def inline(): Unit = noopV(Similarity.ivfTopK(e, "vec_id",
            "embedding", "label", probeF, 3, nprobe = 2))
          val buildSec = timed(graft.sources.VectorIndex.write(
            e, "vec_id", "embedding", "label", "abv"))
          val probes = Similarity.probes(e, "vec_id", "embedding",
            probeF)
          def standing(): Unit = noopV(graft.sources.VectorIndex
            .search(spark, "abv", probes, 3, 2))
          inline(); Caches.clear(); standing(); Caches.clear()
          val i3 = minOf3(inline())
          val s3 = minOf3(standing())
          println(f"[probe] r14e-ab: vecidx n=$nn blocks=$blocks " +
            f"inline_min3_sec=$i3%.2f standing_min3_sec=$s3%.2f " +
            f"build_once_sec=$buildSec%.2f " +
            f"speedup=${i3 / s3}%.2fx")
        }

      case "r15b-scale" =>
        // the graph-refresh growth law: cold vs warm convergence as
        // the graph grows. The claim under test: warm ROUNDS stay flat
        // (∝ log of the gen1→gen2 rank delta, independent of |V|)
        // while cold rounds stay at the log(scale) ceiling — so the
        // warm/cold wall ratio holds at any size, because per-round
        // cost is the same join for both arms.
        val nvs = if (args.length > 1) args.drop(1).toSeq.map(_.toLong)
          else Seq(2000L, 8000L, 32000L)
        def synthNodes(nv: Long) = spark.range(nv)
          .select(concat(lit("n"), col("id")).as("node"))
        def synthEdges(nv: Long, full: Boolean) = {
          val base = spark.range(nv)
            .filter(lit(full) || pmod(col("id"), lit(7)) =!= 3)
          val pairs = Seq((7L, 1L), (13L, 5L), (3L, 11L)).map {
            case (k, c) => base.select(
              concat(lit("n"), col("id")).as("src"),
              concat(lit("n"), pmod(col("id") * k + c, lit(nv))).as("dst"),
              (pmod(col("id"), lit(3)) + 1).as("w"))
          }.reduce(_.unionByName(_))
          pairs.unionByName(pairs.select(col("dst").as("src"),
            col("src").as("dst"), col("w")))
        }
        for (nv <- nvs) {
          val nodes = synthNodes(nv)
          val t0 = System.nanoTime()
          val (r1, k1) = Graph.pageRankFixedPoint(nodes,
            synthEdges(nv, full = false), scale = Graph.RefreshScale)
          val ranks1 = Caches.persistTracked(r1); ranks1.count()
          val t1 = System.nanoTime()
          val (rc, kc) = Graph.pageRankFixedPoint(nodes,
            synthEdges(nv, full = true), scale = Graph.RefreshScale)
          rc.write.format("noop").mode("overwrite").save()
          val t2 = System.nanoTime()
          val (rw, kw) = Graph.pageRankFixedPoint(nodes,
            synthEdges(nv, full = true), init = Some(ranks1),
            scale = Graph.RefreshScale)
          rw.write.format("noop").mode("overwrite").save()
          val t3 = System.nanoTime()
          println(f"[probe] r15b-scale: nv=$nv gen1_rounds=$k1 " +
            f"(${(t1 - t0) / 1e9}%.1f s) cold_rounds=$kc " +
            f"(${(t2 - t1) / 1e9}%.1f s) warm_rounds=$kw " +
            f"(${(t3 - t2) / 1e9}%.1f s) " +
            f"wall_speedup=${(t2 - t1).toDouble / (t3 - t2)}%.1fx")
          Caches.clear()
        }

      case "r15a-ab" =>
        // the r14e-ab crossover question, answered: refresh measured
        // ≈ break-even on 30-token synthetic docs because the ~4
        // column-pruned corpus passes of the diff dominate when
        // per-row ingest is trivial. On LONG documents the ingest
        // cost is ∝ tokens (positional rows ∝ dl) while the diff
        // stays ∝ docs (32-byte digests) — this probe re-runs the
        // same A/B at ~1k-token docs, where the claimed 100 TB
        // steady-state win must either materialize or reshape
        // refreshFromDiff.
        val nLd = args.lift(1).map(_.toLong).getOrElse(10000L)
        val ldToks = args.lift(2).map(_.toInt).getOrElse(1000)
        def synthLong(n: Long) = spark.range(n).select(
          col("id").as("doc_id"),
          concat_ws(" ", transform(sequence(lit(0), lit(ldToks - 1)),
            i => concat(lit("w"),
              pmod(col("id") * 31 + i * 7, lit(10000))))).as("text"))
        // materialize the corpora to PARQUET first — the deployment
        // shape. The first r15a draw generated the synthetic text
        // inline, so refresh's multiple column-pruned corpus passes
        // re-paid the 1000-element transform per pass while the
        // re-ingest arm paid it once: a probe artifact, not the law.
        val ldDir = "/tmp/graft_r15a_corpus"
        synthLong(nLd).write.mode("overwrite").parquet(s"$ldDir/base")
        synthLong(nLd).withColumn("text",
            when(pmod(col("doc_id"), lit(64)) === 0,
              concat(col("text"), lit(" rev2")))
              .otherwise(col("text")))
          .write.mode("overwrite").parquet(s"$ldDir/gen2_64")
        for (denom <- Seq(16, 4))
          synthLong(nLd).withColumn("text",
              when(pmod(col("doc_id"), lit(denom)) === 0,
                concat(col("text"), lit(" rev2")))
                .otherwise(col("text")))
            .write.mode("overwrite").parquet(s"$ldDir/gen2_$denom")
        graft.TmpDirs.deleteOnExit(ldDir)
        val baseLd = spark.read.parquet(s"$ldDir/base")
        def gen2Ld(denom: Int) =
          spark.read.parquet(s"$ldDir/gen2_$denom")
        // min-of-2 with an UNTIMED reset before EACH sample: the
        // bodies are stateful (refreshFromDiff applies its diff onto
        // the index — re-running it on an already-refreshed index
        // times a different workload state: an extra log batch, stats
        // double-applied), so each sample must start from the same
        // bootstrapped state, not from the previous sample's output.
        // (The first r15a draw's 26-vs-16 s inversion between adjacent
        // deltas was single-shot noise — hence min-of-2 at all.)
        def timedLd(prep: => Unit)(body: => Unit): Double = {
          def one(): Double = {
            prep; Caches.clear()
            val t0 = System.nanoTime(); body
            val s = (System.nanoTime() - t0) / 1e9; Caches.clear(); s
          }
          math.min(one(), one())
        }
        // warm BOTH arms untimed (the r14e-ab lesson)
        graft.sources.Bm25Index.write(gen2Ld(64), "doc_id", "text",
          "abl_full")
        Caches.clear()
        val fullLd = timedLd(())(graft.sources.Bm25Index.write(
          gen2Ld(64), "doc_id", "text", "abl_full"))
        graft.sources.Bm25Index.write(baseLd, "doc_id", "text",
          "abl_inc")
        Caches.clear()
        timedLd(graft.sources.Bm25Index.write(baseLd, "doc_id",
          "text", "abl_inc"))(
          graft.sources.Bm25Index.refreshFromDiff(baseLd,
            gen2Ld(64), "doc_id", "text", "abl_inc"))
        for (denom <- Seq(64, 16, 4)) {
          val s = timedLd(graft.sources.Bm25Index.write(baseLd,
            "doc_id", "text", "abl_inc"))(
            graft.sources.Bm25Index.refreshFromDiff(
              baseLd, gen2Ld(denom), "doc_id", "text", "abl_inc"))
          println(f"[probe] r15a-ab: refresh n=$nLd dl=$ldToks " +
            f"delta=1/$denom refresh_sec=$s%.2f " +
            f"full_reingest_sec=$fullLd%.2f " +
            f"speedup=${fullLd / s}%.2fx")
        }

      case "bm25-ab" =>
        // the law behind sources/Bm25Index: the inline ranker pays the
        // corpus text scan + tokenize + aggregate on EVERY query
        // batch; the standing index pays it once at build and serves
        // each batch from bucketed postings. Both answer bit-equal
        // (CorpusOpsSpec); this measures the per-batch tax removed.
        val sizes = args.drop(1).map(_.toLong) match {
          case a if a.nonEmpty => a.toSeq
          case _ => Seq(100000L, 400000L)
        }
        // 10k-word vocabulary (realistic selectivity: the query terms
        // are a vanishing fraction of the corpus vocabulary — an
        // 8-word vocab would make every posting match and hide the
        // index's pruning entirely)
        def synthD(n: Long) = spark.range(n)
          .select(col("id").as("doc_id"),
            concat_ws(" ", (0 until 30).map { i =>
              concat(lit("w"), pmod(col("id") * 31 + i * 7, lit(10000)))
            }: _*).as("text"))
        def noopW(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        val qs = Seq(("q1", "w17 w42"), ("q2", "w999 w1234 w5000"),
          ("q3", "w7777 zzz"))
        noopW(CorpusOps.bm25TopK(synthD(10000L), "doc_id", "text", qs))
        Caches.clear()
        for (n <- sizes) {
          val d = synthD(n)
          val inline = minOf3(noopW(
            CorpusOps.bm25TopK(d, "doc_id", "text", qs)))
          val t0 = System.nanoTime()
          graft.sources.Bm25Index.write(d, "doc_id", "text", "gbm25ab")
          val build = (System.nanoTime() - t0) / 1e9
          Caches.clear()
          val indexed = minOf3(noopW(
            graft.sources.Bm25Index.search(spark, "gbm25ab", qs)))
          println(f"[probe] bm25-ab: n=$n inline_min3_sec=$inline%.2f " +
            f"index_build_sec=$build%.2f indexed_min3_sec=$indexed%.2f " +
            f"per_batch_speedup=${inline / indexed}%.1fx")
        }

      case "hll-ab" =>
        // the q204/q205 claim, measured: a register sketch's
        // post-shuffle state is (groups × 2^p) rank maxima while the
        // exact count-distinct drags every distinct KEY through the
        // exchange — at growing per-group cardinality the sketch's
        // shuffle bytes stay constant and the exact side's grow
        // linearly. Synthetic (group, key) pairs, keys md5-scrambled
        // so neither side benefits from clustering; both sides
        // aggregate to one row per group through the noop sink.
        val nArg = args.lift(1).map(_.toInt).getOrElse(2000000)
        def noopW(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        for (n <- Seq(nArg / 4, nArg)) {
          // ~n/2 distinct keys per group across 8 groups, duplicated
          val base = spark.range(n.toLong)
            .select(pmod(col("id"), lit(8)).cast("string").as("grp"),
              (col("id") % lit(math.max(1L, n / 2L))).as("k"))
          // the sketch-ONLY path (the gate's front half — the gate
          // itself also joins the exact side, which is what the
          // sketch exists to avoid)
          val h = conv(substring(md5(col("k").cast("string")), 1, 8),
            16, 10).cast("long")
          val reg = pmod(h, lit(256))
          val w = ((h - reg) / lit(256)).cast("long")
          val rho = when(w === 0, lit(25))
            .otherwise(lit(25) - length(bin(w)))
          val sketch = minOf3(noopW(
            base.select(col("grp"), reg.as("reg"), rho.as("rho"))
              .groupBy("grp", "reg").agg(max("rho").as("mr"))
              .groupBy("grp")
              .agg(sum("mr").as("sum_rank"), max("mr").as("max_rank"),
                count(lit(1)).as("present_regs"))))
          val exact = minOf3(noopW(
            base.groupBy("grp")
              .agg(countDistinct(col("k")).as("n_exact"))))
          println(f"[probe] hll-ab: n=$n sketch_min3_sec=$sketch%.2f " +
            f"exact_min3_sec=$exact%.2f ratio=${exact / sketch}%.2fx")
        }

      case "census-ab" =>
        // the q202 claim, measured: a media census reads HEADERS —
        // a few dozen bytes per row, flat in payload size and format
        // — while a content decode pays the full pixel walk
        // (inflate/LZW/entropy decode + filter reconstruction). Same
        // parquet-staged census rows (5 image containers + WAV +
        // text + FLAC/MP3/ADTS), both arms through the noop sink:
        // arm A = the q202 sniff pair (decodeImg + decodeAudio),
        // arm B = the container-sniffing pixel dHash the dedup
        // queries pay. At 100 TB the ratio IS the reason the census
        // runs first — it prices the bucket before any decode is
        // committed.
        val cDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
        val cPath = "/tmp/graft_census_ab"
        CorpusQueries.imageFixture(spark, cDir, "census")
          .write.mode("overwrite").parquet(cPath)
        TmpDirs.deleteOnExit(cPath)
        val cRows = spark.read.parquet(cPath)
        def cNoop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        val sniffSec = minOf3(cNoop(cRows.select(col("doc_id"),
          graft.functions.Udfs.decodeImg(col("content")).as("m"),
          graft.functions.Udfs.decodeAudio(col("content")).as("a"))))
        val decodeSec = minOf3(cNoop(cRows.select(col("doc_id"),
          graft.functions.Udfs.imagePhash(col("content")).as("h"))))
        println(f"[probe] census-ab: sf=$cDir sniff_min3_sec=" +
          f"$sniffSec%.2f pixel_decode_min3_sec=$decodeSec%.2f " +
          f"ratio=${decodeSec / sniffSec}%.1fx")

      case "img-synth" =>
        // the SYNTHESIS half of the staged image gates: q176/q180/
        // q181 now time read → decode → dedup over parquet-staged
        // bytes (the deployment shape — stored content, not re-derived
        // per scan); this probe times what they no longer pay — the
        // spec-true PNG/BMP byte generation in Column arithmetic,
        // including the CRC32/Adler32 HOF loops — so a regression in
        // the generators stays measurable instead of hiding in (or
        // polluting) the decode rows.
        val imgDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
        for (name <- Seq("png_gray", "png_rgb", "cross_container")) {
          val sec = minOf3(
            CorpusQueries.imageFixture(spark, imgDir, name)
              .write.format("noop").mode("overwrite").save())
          println(f"[probe] img-synth: $name sf=$imgDir " +
            f"synth_sec=$sec%.2f")
        }

      case "zorder-ab" =>
        // the law behind Sinks.writeZOrdered: a fact table laid out by
        // ONE dimension prunes parquet files on that dimension only —
        // the Morton layout gives tight min/max on BOTH filter dims.
        // Synthetic 2-dim fact (user pseudo-random, ts sequential,
        // both 2^20-spaced) with a ~200-byte payload — decode cost is
        // what pruning saves; a narrow-longs fact is task-overhead-
        // bound on this box and hides the effect. Two query shapes:
        // both-dims (each layout prunes something) and user-only (the
        // dimension the linear layout cannot prune).
        val n = args.lift(1).map(_.toLong).getOrElse(10000000L)
        val files = args.lift(2).map(_.toInt).getOrElse(256)
        val base = spark.range(n).select(
          ((col("id") * 2654435761L) % 1048576L).as("user_id"),
          ((col("id") * 1048576L) / n).as("ts_bucket"),
          rpad(col("id").cast("string"), 200, "x").as("payload"))
        val linPath = "/tmp/graft_zorder_lin"
        val zPath = "/tmp/graft_zorder_z"
        val tW0 = System.nanoTime()
        base.repartitionByRange(files, col("ts_bucket"))
          .sortWithinPartitions("ts_bucket")
          .write.mode("overwrite").parquet(linPath)
        val linWriteSec = (System.nanoTime() - tW0) / 1e9
        val tW1 = System.nanoTime()
        graft.sources.Sinks.writeZOrdered(base, zPath, col("user_id"),
          col("ts_bucket"), numFiles = files)
        val zWriteSec = (System.nanoTime() - tW1) / 1e9
        // 1/32 of each dimension's space
        val (u1, u2) = (100000L, 132768L)
        val (t1, t2) = (500000L, 532768L)
        def frame(path: String, userOnly: Boolean) = {
          val d = spark.read.parquet(path)
            .filter(col("user_id").between(u1, u2))
          val f = if (userOnly) d
                  else d.filter(col("ts_bucket").between(t1, t2))
          f.agg(sum(length(col("payload"))))
        }
        def q(path: String, userOnly: Boolean): Unit = {
          frame(path, userOnly).collect(); ()
        }
        // ROWS SURVIVING row-group pruning, computed from the parquet
        // FOOTERS exactly the way the reader's filter does (row-group
        // user_id min/max vs the range) — the receipt, because wall
        // time on a page-cached local box under-reports (decode runs at
        // memory speed; a cluster pays object-store IO per byte read)
        def rowsSurviving(path: String): Long = {
          import scala.jdk.CollectionConverters._
          val conf = spark.sessionState.newHadoopConf()
          val dir = new org.apache.hadoop.fs.Path(path)
          val fs = dir.getFileSystem(conf)
          fs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet"))
            .map { st =>
              val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
                org.apache.parquet.hadoop.util.HadoopInputFile
                  .fromPath(st.getPath, conf))
              try rdr.getFooter.getBlocks.asScala.collect {
                case b if {
                  val s = b.getColumns.asScala
                    .find(_.getPath.toDotString == "user_id").get
                    .getStatistics
                  s.genericGetMax.asInstanceOf[java.lang.Long] >= u1 &&
                    s.genericGetMin.asInstanceOf[java.lang.Long] <= u2
                } => b.getRowCount
              }.sum
              finally rdr.close()
            }.sum
        }
        for (p <- Seq(linPath, zPath); uo <- Seq(true, false)) q(p, uo)
        val linBoth = minOf3(q(linPath, userOnly = false))
        val zBoth = minOf3(q(zPath, userOnly = false))
        val linUser = minOf3(q(linPath, userOnly = true))
        val zUser = minOf3(q(zPath, userOnly = true))
        val linRows = rowsSurviving(linPath)
        val zRows = rowsSurviving(zPath)
        println(f"[probe] zorder-ab: n=$n files=$files " +
          f"both_dims_lin_min3_sec=$linBoth%.2f both_dims_z_min3_sec=$zBoth%.2f " +
          f"user_only_lin_min3_sec=$linUser%.2f user_only_z_min3_sec=$zUser%.2f " +
          f"user_only_speedup=${linUser / zUser}%.2fx " +
          f"user_only_rows_scanned_lin=$linRows user_only_rows_scanned_z=$zRows " +
          f"scan_reduction=${linRows.toDouble / math.max(zRows, 1)}%.1fx " +
          f"write_lin_sec=$linWriteSec%.1f write_z_sec=$zWriteSec%.1f")

      case "streaming-neardup" =>
        // throughput of the streaming MinHash-LSH near-dup: one bulk
        // micro-batch of a deterministic planted-dup corpus through the
        // full banding + bucket-state + verify chain into a memory sink.
        // Every 10th doc duplicates its predecessor (all other docs are
        // base-suffixed unique, so EXACTLY n/10 verified pairs exist),
        // exercising state, verify, and emission. The query never
        // quiesces under ProcessingTimeTimeout (timeout batches keep
        // firing — see EventStreamsSpec), so completion is the sink
        // reaching the exact expected pair count, polled at 100 ms.
        val n = args.lift(1).map(_.toInt).getOrElse(20000)
        import spark.implicits._
        implicit val sq = spark.sqlContext
        val wordList = Vector("alpha", "bravo", "charlie", "delta",
          "echo", "foxtrot", "golf", "hotel", "india", "juliet",
          "kilo", "lima", "mike", "november", "oscar", "papa")
        def doc(i: Int): String = {
          val base = if (i % 10 == 9) i - 1 else i
          (0 until 12).map(k => wordList((base + k * 3) % 16) +
            base.toString).mkString(" ")
        }
        val expected = n / 10
        def once(): Unit = {
          val in = org.apache.spark.sql.execution.streaming.runtime
            .MemoryStream[(Long, String)]
          val q = graft.streaming.EventStreams
            .streamingNearDup(in.toDF().toDF("doc_id", "text"))
            .writeStream.format("memory").queryName("probe_snd")
            .outputMode("append").start()
          try {
            in.addData((0 until n).map(i => (i.toLong, doc(i))))
            val deadline = System.nanoTime() + 300L * 1000 * 1000 * 1000
            def found(): Long = spark.table("probe_snd")
              .select("a", "b").distinct().count()
            var pairs = found()
            while (pairs != expected && System.nanoTime() < deadline) {
              Thread.sleep(100)
              pairs = found()
            }
            require(pairs == expected,
              s"expected $expected distinct pairs, sink has $pairs")
          } finally {
            q.stop()
            spark.sql("DROP TABLE IF EXISTS probe_snd")
          }
        }
        once() // warm: state-store init, codegen, JIT
        val sec = minOf3(once())
        println(f"[probe] streaming-neardup: docs=$n pairs=$expected " +
          f"min3_sec=$sec%.2f docs_per_sec=${n / sec}%.0f")

      case other =>
        System.err.println(s"unknown probe '$other' " +
          "(expected: components | bucketed-merge | ngram-ab | " +
          "asof-ab | containment-ab | range-ab | incremental-ab | " +
          "index-ab | streaming-asof | streaming-neardup)")
        sys.exit(2)
    }
    spark.stop()
  }
}
