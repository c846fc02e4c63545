package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** ATOMIC COMMIT for the standing-index family — the missing
  * transactional layer over [[DedupIndex]]/[[Bm25Index]]/[[VectorIndex]]/
  * [[StatsLedger]]'s log-structured parquet tables (the reference's
  * analogue is Postgres' transactional MERGE,
  * reid/pipelines/property.py:96-126; at corpus scale the same guarantee
  * comes from a manifest, which is how Delta/Iceberg commit).
  *
  * One tiny `<prefix>_manifest` DIRECTORY per index records the commit
  * log as zero-byte MARKER FILES named `<state>_g<gen>_b<b>`, where
  * `gen` is a physical-table GENERATION (compaction rewrites into a NEW
  * generation's tables and flips here), `b` is a BATCH id within a
  * generation (every ingest/takedown/refresh stamps its rows with one
  * `b`), and `state` is `intent` (id claimed, data may be partially
  * written) or `commit` (fully written, visible). Marker files instead
  * of a catalog table (the r15 layout) because the manifest is pure
  * driver-side metadata: every protocol step is one atomic file
  * create/list — no Spark job — so the per-batch fixed cost that
  * dominated the r15 lifecycle timings (two 1-row table-write jobs +
  * a collect per batch) drops to filesystem latency. This is exactly
  * the Delta/Iceberg posture: the transaction log is files, only the
  * data is tables.
  *
  * The protocol — CONCURRENT writers, any number of readers:
  *
  *  1. a writer CLAIMS a fresh `b` (or `gen`) by atomically creating
  *     its `intent` marker with exclusive create (O_EXCL): the first
  *     candidate is one past every id the writer can list, and when
  *     two writers race to the same candidate the create arbitrates —
  *     exactly one wins, the loser probes upward and claims the next
  *     free id ([[claimBatchFrom]]; GenerationsSpec interleaves two
  *     writers step by step). Claimed ids are never reused, even after
  *     a crash: the marker file persists,
  *  2. writes ALL its data rows stamped with that (gen, b) — across
  *     however many physical tables the index keeps,
  *  3. commits by creating ONE `commit` marker.
  *
  * Readers resolve the manifest ONCE per operation ([[committedState]]:
  * one bounded directory listing): current generation = max gen
  * carrying a commit, visible batches = that generation's committed `b`
  * list — then filter every table scan to `b IN (visible)`. The batch
  * list is bounded (it grows only until the next compaction resets it),
  * so the predicate reaches the parquet scan as a static filter.
  * Consequences:
  *
  *  - a crash between steps 2 and 3 leaves orphan rows that are
  *    INVISIBLE forever (their `b` is never committed and never
  *    reallocated) and are physically dropped at the next compaction;
  *  - a multi-table ingest (Bm25Index writes four tables) or a
  *    two-legged refresh (takedown + re-append under ONE `b`) is
  *    all-or-nothing — no reader ever sees a half-applied batch;
  *  - compaction builds the ENTIRE next generation's tables while
  *    readers keep resolving the old one, then flips visibility with
  *    the single commit-marker create — no purge-then-rename window,
  *    the index is never missing or mixed-generation (GenerationsSpec
  *    simulates the interrupted compaction);
  *  - old generations are garbage-collected AFTER the flip ([[gc]]),
  *    which also deletes their dead manifest markers — the manifest
  *    stays bounded at (current generation's batches + retained
  *    generations) no matter how many micro-batches streaming ingest
  *    appends. `retain` keeps the newest N pre-flip generations on
  *    disk for readers still mid-scan on them (the Delta VACUUM
  *    retention knob); retain = 0 is the immediate-GC posture.
  *
  * The arbitration rests on ONE primitive — atomic exclusive create —
  * extracted behind [[ClaimPrimitive]] so the store requirement is a
  * small, swappable, TESTABLE contract instead of prose. The default
  * ([[ClaimPrimitive.Exclusive]]) is atomic on HDFS (create with
  * overwrite=false is a namenode-arbitrated namespace op) and on local
  * `file:` paths (routed through java.nio O_EXCL — Hadoop's
  * RawLocalFileSystem would NOT do: its create(p, false) is an
  * exists() check followed by a plain truncating open, so two truly
  * concurrent racers can both "win"). An object store without atomic
  * exclusive create (classic S3) must plug a conditional-write
  * primitive (If-None-Match PUT) or keep the manifest on a consistent
  * catalog — the same caveat every file-format transaction log
  * carries; GenerationsSpec makes the failure mode executable with a
  * deliberately non-atomic [[ClaimPrimitive]].
  */
object Generations {

  /** The atomic claim primitive: create `p` iff absent, atomically —
    * exactly one of N concurrent callers returns true. Everything the
    * concurrent-writer protocol guarantees reduces to this contract
    * holding on the manifest's filesystem. */
  trait ClaimPrimitive {
    def claim(fs: FileSystem, p: Path): Boolean
  }

  object ClaimPrimitive {
    /** Default: true O_EXCL semantics.
      *  - `file:` scheme → java.nio.file.Files.createFile, which maps
      *    to open(O_CREAT|O_EXCL) — kernel-arbitrated. (Hadoop's local
      *    FS create(p, overwrite=false) is exists()-then-open: a TOCTOU
      *    window two concurrent writers can both pass.)
      *  - other schemes → FileSystem.create(p, overwrite=false), which
      *    HDFS implements as an atomic namespace operation. */
    object Exclusive extends ClaimPrimitive {
      def claim(fs: FileSystem, p: Path): Boolean =
        if (fs.getScheme == "file") {
          val local = java.nio.file.Paths.get(p.toUri.getPath)
          java.nio.file.Files.createDirectories(local.getParent)
          try { java.nio.file.Files.createFile(local); true }
          catch {
            case _: java.nio.file.FileAlreadyExistsException => false
          }
        } else {
          try { fs.create(p, false).close(); true }
          catch { case e: java.io.IOException =>
            if (fs.exists(p)) false else throw e }
        }
    }

    /** A deliberately NON-atomic claim — exists() then plain create,
      * the semantics of a store without conditional writes. Exists so
      * GenerationsSpec can DEMONSTRATE the documented object-store
      * failure (two racers both claiming one id) instead of merely
      * asserting it in scaladoc. Never used outside tests. */
    class NonAtomicSimulation(interleave: () => Unit)
        extends ClaimPrimitive {
      def claim(fs: FileSystem, p: Path): Boolean =
        if (fs.exists(p)) false
        else { interleave(); fs.create(p, true).close(); true }
    }

    /** CONDITIONAL-WRITE arbitration — the deployment alternative for
      * stores without O_EXCL create but with an atomic no-overwrite
      * PUBLISH primitive (the trait's raison d'être beyond POSIX):
      * stage a writer-unique proposal file (plain create — uniqueness
      * comes from the UUID in the NAME, so staging needs no atomicity
      * at all), then publish it onto the claim path with one
      * compare-and-swap-shaped call:
      *
      *  - `file:` scheme → link(2) via Files.createLink, which fails
      *    EEXIST atomically in the kernel — the classic NFS-safe
      *    lockfile protocol (O_EXCL was historically unreliable over
      *    NFSv2, links never were);
      *  - other schemes → FileSystem.rename(tmp, p), which HDFS
      *    arbitrates in the namenode: dest-exists rename returns
      *    false without touching either path. VALIDITY IS PER-STORE:
      *    HDFS/GCS/ABFS renames arbitrate server-side, but vanilla
      *    S3's "rename" is a client-side probe + copy + delete —
      *    it CANNOT arbitrate; use [[ConditionalPut]] there (the
      *    full per-store matrix lives on its scaladoc).
      *
      * Unlike [[NonAtomicSimulation]] there is NO exists() probe
      * anywhere in the protocol — the publish call itself arbitrates —
      * so the TOCTOU window the test double demonstrates structurally
      * cannot exist: GenerationsSpec drives two writers through the
      * same adversarial interleave points (the `interleave` hook runs
      * between stage and publish, the widest possible race window)
      * and exactly one wins. The staged proposal is deleted win or
      * lose; a crash between stage and publish leaves a `.claim.` tmp
      * that [[gc]]'s marker parser already ignores. */
    class RenameCas(interleave: () => Unit = () => ())
        extends ClaimPrimitive {
      def claim(fs: FileSystem, p: Path): Boolean = {
        val tmp = new Path(p.getParent,
          p.getName + ".claim." + java.util.UUID.randomUUID().toString)
        if (fs.getScheme == "file") {
          val lt = java.nio.file.Paths.get(tmp.toUri.getPath)
          java.nio.file.Files.createDirectories(lt.getParent)
          java.nio.file.Files.write(lt, Array.emptyByteArray)
        } else fs.create(tmp, true).close()
        interleave()
        val won =
          if (fs.getScheme == "file") {
            try {
              java.nio.file.Files.createLink(
                java.nio.file.Paths.get(p.toUri.getPath),
                java.nio.file.Paths.get(tmp.toUri.getPath))
              true
            } catch {
              case _: java.nio.file.FileAlreadyExistsException => false
            }
          } else fs.rename(tmp, p)
        fs.delete(tmp, false)
        won
      }
    }

    /** The S3-TRUE claim — for stores where RENAME cannot arbitrate.
      * [[RenameCas]] assumes an atomic dest-exists rename, which
      * HDFS/GCS/ABFS provide and vanilla S3 does NOT (S3A rename is
      * a client-side probe + copy + delete — a TOCTOU window at
      * every step). There the one-call primitive is a CONDITIONAL
      * PUT: "write this object iff absent", arbitrated by the
      * SERVER (HTTP `If-None-Match: *`, which S3 honors for PutObject
      * since 2024; GCS's equivalent precondition is
      * `x-goog-if-generation-match: 0`). The store call arrives
      * INJECTED — `putIfAbsent` must write the zero-byte marker iff
      * absent and report whether it wrote — because this engine ships
      * no vendor SDKs; the injection must honor exactly that contract
      * (no client probe, no retry-overwrite). GenerationsSpec drives
      * it through the same adversarial interleave as the other
      * primitives, with an atomically-arbitrated test double standing
      * in for the store.
      *
      * Per-store validity of the three primitives (the deployment
      * matrix):
      *  - POSIX `file:` — [[Exclusive]] (O_EXCL) and [[RenameCas]]
      *    (link(2) EEXIST) both atomic; ConditionalPut n/a.
      *  - HDFS — [[Exclusive]] and [[RenameCas]] both atomic
      *    (namenode-arbitrated namespace operations).
      *  - GCS / ABFS — [[RenameCas]] holds (atomic dest-exists
      *    rename in the connectors); ConditionalPut holds via the
      *    stores' generation/etag preconditions.
      *  - Vanilla S3 — ONLY ConditionalPut: no exclusive create,
      *    and rename is copy+delete. */
    class ConditionalPut(putIfAbsent: Path => Boolean,
                         interleave: () => Unit = () => ())
        extends ClaimPrimitive {
      def claim(fs: FileSystem, p: Path): Boolean = {
        interleave()
        putIfAbsent(p)
      }
    }
  }

  /** The primitive in force — swappable by tests only. */
  private[graft] var claimPrimitive: ClaimPrimitive =
    ClaimPrimitive.Exclusive

  def manifestT(prefix: String): String = s"${prefix}_manifest"

  /** Physical table name of `logical` at `gen`. Generation 0 keeps the
    * plain name, so a freshly bootstrapped index is laid out exactly as
    * before this layer existed. */
  def physical(prefix: String, logical: String, gen: Long): String =
    if (gen == 0L) s"${prefix}_${logical}" else s"${prefix}_${logical}_gen$gen"

  /** Resolve `logical`'s CURRENT physical name — the reader entry point
    * (also what specs use to find tables on disk post-compaction). */
  def physicalFor(spark: SparkSession, prefix: String,
                  logical: String): String =
    physical(prefix, logical, committedState(spark, prefix)._1)

  // ----------------------------------------------- marker-file storage

  private def dir(spark: SparkSession, prefix: String): Path =
    new Path(spark.sessionState.conf.warehousePath, manifestT(prefix))

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private val Marker = "(intent|commit)_g(\\d+)_b(\\d+)".r

  private def marker(spark: SparkSession, prefix: String, gen: Long,
                     b: Long, state: String): Path =
    new Path(dir(spark, prefix), s"${state}_g${gen}_b$b")

  /** The full manifest: (gen, b, state) rows parsed from marker names —
    * one bounded directory listing, no Spark job. */
  private[graft] def rows(spark: SparkSession,
                          prefix: String): Seq[(Long, Long, String)] = {
    val d = dir(spark, prefix)
    val f = fsOf(spark, d)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).toSeq.flatMap(_.getPath.getName match {
      case Marker(state, g, b) => Some((g.toLong, b.toLong, state))
      case _ => None
    })
  }

  /** Atomically create a marker via the pluggable [[ClaimPrimitive]];
    * false when it already exists — a concurrent writer won this id. */
  private def tryCreate(spark: SparkSession, prefix: String, gen: Long,
                        b: Long, state: String): Boolean = {
    val p = marker(spark, prefix, gen, b, state)
    claimPrimitive.claim(fsOf(spark, p), p)
  }

  // ------------------------------------------------------ the protocol

  /** Start a fresh index: reset the manifest (and any legacy catalog
    * table holding its location). Until [[commit]] lands the index has
    * no committed generation and readers refuse it, so bootstrap needs
    * no intent marker — it is the one write with nothing prior to stay
    * readable, and its invisibility-until-commit is structural. */
  def beginBootstrap(spark: SparkSession, prefix: String): Unit =
    Sinks.purgeTable(spark, manifestT(prefix))

  // ------------------------------------------- writer-pinned settings

  private val BucketsMarker = "buckets_(\\d+)".r

  /** Persist the WRITER's bucket count in the manifest — the layout
    * knob every later reader and maintenance pass MUST follow (a
    * reader folding with the wrong count would compute wrong bucket
    * ids in [[Sinks.tombstonedBuckets]] and partial compaction would
    * rewrite the wrong files). Written once at bootstrap, immutable
    * for the index's lifetime ([[gc]] never touches it — changing the
    * count means re-bucketing every table, i.e. a fresh bootstrap).
    * One marker file, same discipline as the commit log. */
  def setBuckets(spark: SparkSession, prefix: String, n: Int): Unit = {
    require(n >= 1, s"bucket count must be >= 1, got $n")
    val p = new Path(dir(spark, prefix), s"buckets_$n")
    require(claimPrimitive.claim(fsOf(spark, p), p),
      s"${manifestT(prefix)}: bucket count already pinned")
  }

  /** The writer-pinned bucket count, or `default` for indexes
    * bootstrapped before the marker existed (their writers used the
    * compile-time default — the counts agree by construction). */
  def bucketsOf(spark: SparkSession, prefix: String,
                default: Int): Int = {
    val d = dir(spark, prefix)
    val f = fsOf(spark, d)
    if (!f.exists(d)) default
    else f.listStatus(d).toSeq.map(_.getPath.getName).collectFirst {
      case BucketsMarker(n) => n.toInt
    }.getOrElse(default)
  }

  /** Claim the first free batch id at or past `startB` in generation
    * `g` — the arbitration loop, split out so GenerationsSpec can
    * drive two writers from the SAME starting candidate (the state a
    * concurrent listing produces): exactly one wins each id, the
    * loser detects the collision and retries upward. */
  private[graft] def claimBatchFrom(spark: SparkSession, prefix: String,
                                    g: Long, startB: Long): Long = {
    var b = startB
    while (!tryCreate(spark, prefix, g, b, "intent")) b += 1
    b
  }

  /** Allocate the next batch id in the current committed generation via
    * the atomic intent-marker claim. Crashed allocations are never
    * reused: their markers persist and the claim probes past them
    * (until [[gc]] reaps the ones a later commit makes safe to drop —
    * see the orphaned-intent note there). */
  def beginBatch(spark: SparkSession, prefix: String): (Long, Long) = {
    val rs = rows(spark, prefix)
    // the CURRENT generation is the flipped (b0-committed) max — the
    // committedState rule: appending into a generation still being
    // built by a partial compaction would hand that compaction's file
    // copy a moving target
    val flipped = rs.filter(r => r._3 == "commit" && r._2 == 0L)
      .map(_._1)
    require(flipped.nonEmpty,
      s"${manifestT(prefix)}: no committed generation to append to")
    val g = flipped.max
    (g, claimBatchFrom(spark, prefix, g,
      rs.filter(_._1 == g).map(_._2).max + 1))
  }

  /** Allocate the next generation (for compaction's full rewrite) via
    * the same claim loop — two concurrent compactions can never build
    * into the same generation's tables. */
  def beginGeneration(spark: SparkSession, prefix: String): Long = {
    val rs = rows(spark, prefix)
    require(rs.exists(_._3 == "commit"),
      s"${manifestT(prefix)}: no committed generation to compact")
    var ng = rs.map(_._1).max + 1
    while (!tryCreate(spark, prefix, ng, 0L, "intent")) ng += 1
    ng
  }

  /** The commit point: ONE created marker makes batch `b` of `gen`
    * (and, if it is a new generation's first, the whole generation)
    * visible. */
  def commit(spark: SparkSession, prefix: String, gen: Long,
             b: Long): Unit =
    require(tryCreate(spark, prefix, gen, b, "commit"),
      s"${manifestT(prefix)}: batch g${gen}_b$b committed twice")

  /** Reader resolution: (current committed generation, its visible
    * batch ids, sorted). One bounded directory listing per operation.
    *
    * The CURRENT generation is the max gen whose batch-0 commit exists
    * — b = 0 is every generation's bootstrap/flip batch (bootstrap and
    * every compaction commit it), so the b0 marker IS the atomic
    * generation switch. This matters for PARTIAL compaction, which
    * carries the old generation's batch ids into the new one: those
    * carry-over commits land FIRST and stay invisible (no b0 yet), and
    * the single b0 create flips the whole batch set at once — without
    * the rule, a reader racing the carry-over creates would adopt the
    * new generation with a torn, partial batch list. */
  def committedState(spark: SparkSession,
                     prefix: String): (Long, Seq[Long]) = {
    val committed = rows(spark, prefix).filter(_._3 == "commit")
    val flipped = committed.filter(_._2 == 0L).map(_._1)
    require(flipped.nonEmpty,
      s"${manifestT(prefix)}: no committed generation")
    val g = flipped.max
    (g, committed.filter(_._1 == g).map(_._2).distinct.sorted)
  }

  /** Drop superseded generations' physical tables AND their dead
    * manifest markers. Runs strictly AFTER the flip; idempotent, so a
    * crash mid-GC just re-runs later.
    *
    *  - `retain` keeps the newest N committed generations BELOW
    *    `keepGen` on disk (markers and tables), so a reader that
    *    resolved its state before the flip still completes its scan —
    *    the Delta VACUUM retention window; retain = 0 reproduces
    *    immediate GC.
    *  - Only generations BELOW `keepGen` are touched: an intent above
    *    it is a concurrent compaction mid-build (or its crash residue),
    *    whose claim must stay so its number is never reused while its
    *    tables may exist; it is reclaimed by the gc after the NEXT
    *    flip passes it.
    *  - Deleting dropped generations' markers IS the manifest
    *    compaction: the listing stays bounded at the current
    *    generation's batches + retained history, no matter how many
    *    micro-batches streaming ingest appended before the flip
    *    (GenerationsSpec pins the bound).
    */
  def gc(spark: SparkSession, prefix: String, keepGen: Long,
         logicals: Seq[String], retain: Int = 0): Unit = {
    val rs = rows(spark, prefix)
    val retained = rs.filter(r => r._3 == "commit" && r._1 < keepGen)
      .map(_._1).distinct.sorted.takeRight(retain).toSet
    val drop = rs.map(_._1).distinct
      .filter(g => g < keepGen && !retained(g))
    drop.foreach(g => logicals.foreach(l =>
      Sinks.purgeTable(spark, physical(prefix, l, g))))
    val f = fsOf(spark, dir(spark, prefix))
    rs.filter(r => drop.contains(r._1)).foreach { case (g, b, st) =>
      f.delete(marker(spark, prefix, g, b, st), false) }
    // ORPHANED-INTENT reaping within the surviving generation: a
    // crash-looping writer leaves an intent marker per attempt, and
    // without this the manifest grows one file per crash forever. An
    // intent with no commit is safe to delete once SOME LATER batch of
    // the same generation committed: future claims probe from
    // max(all markers)+1 ≥ that commit's id + 1, so the reaped id can
    // never be reallocated (its invisible data rows stay invisible and
    // are physically dropped at the next compaction, exactly as
    // before). Tail orphans — above every commit — must stay: deleting
    // them would free their id for reuse while their rows may exist.
    // A LIVE slow writer below the max commit may lose its intent
    // marker here; its own commit still lands and is honored — the
    // intent's only job was claim arbitration, already done.
    val keep = rs.filter(_._1 == keepGen)
    val committedB = keep.filter(_._3 == "commit").map(_._2)
    if (committedB.nonEmpty) {
      val maxCommitted = committedB.max
      keep.filter(r => r._3 == "intent" && r._2 < maxCommitted &&
          !committedB.contains(r._2))
        .foreach { case (g, b, st) =>
          f.delete(marker(spark, prefix, g, b, st), false) }
    }
  }
}
