package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Bm25Index, DedupIndex, Generations}

/** The atomic-commit contract of the standing-index family
  * ([[graft.sources.Generations]]): a reader NEVER observes a missing
  * table, a half-written batch, or a mixed-generation index —
  * maintenance becomes visible only through the one-row manifest
  * commit. Simulated crashes = running the build/append phases without
  * their commit call (the exact prefix of work a real crash leaves).
  */
class GenerationsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, d)

  private val qs = Seq(("q1", "the order"), ("q2", "data zzz"))

  test("search during compaction: answers are bit-equal while the next " +
    "generation builds, after the flip, and after GC") {
    val p = "tgen1"
    Bm25Index.write(docs.filter(col("doc_id") % 5 <= 2), "doc_id",
      "text", p)
    Bm25Index.append(docs.filter(col("doc_id") % 5 >= 3), "doc_id",
      "text", p)
    Bm25Index.delete(docs.filter(col("doc_id") % 10 === 3), "doc_id",
      "text", p)
    def run() = Bm25Index.search(spark, p, qs).collect().toSeq
    val before = run()
    assert(before.nonEmpty)
    // the build phase: full next-generation tables exist on disk, but
    // no commit row — readers must keep resolving the old generation
    val ng = Bm25Index.buildNextGeneration(spark, p)
    assert(Generations.committedState(spark, p)._1 != ng,
      "uncommitted generation leaked into the committed state")
    assert(run() == before, "search diverged mid-compaction")
    Caches.clear()
    // the flip: ONE manifest row; answers unchanged
    Generations.commit(spark, p, ng, 0L)
    assert(Generations.committedState(spark, p) == (ng -> Seq(0L)))
    assert(run() == before, "search diverged across the commit flip")
    Caches.clear()
    // GC drops the old generation only after the flip
    Generations.gc(spark, p, ng, Bm25Index.Logicals)
    assert(run() == before, "search diverged after GC")
    assert(!spark.catalog.tableExists(s"${p}_postings"),
      "old generation survived GC")
    Caches.clear()
  }

  test("interrupted compaction (crash before commit) leaves the index " +
    "fully readable on the old generation; the next compaction " +
    "succeeds and skips the orphaned generation number") {
    val p = "tgen2"
    DedupIndex.write(docs.filter(col("doc_id") % 5 <= 2), "doc_id",
      "text", p)
    DedupIndex.append(docs.filter(col("doc_id") % 5 === 3), "doc_id",
      "text", p)
    def screen() = DedupIndex.screenExact(spark,
      docs.filter(col("doc_id") % 5 === 4), "doc_id", "text", p)
      .collect().toSeq
    val before = screen()
    assert(before.nonEmpty)
    val orphan = DedupIndex.buildNextGeneration(spark, p) // crash here
    assert(screen() == before, "interrupted compaction changed answers")
    Caches.clear()
    // recovery: a later compaction allocates a FRESH generation (the
    // orphan's number is burned, never reused) and completes normally
    DedupIndex.compact(spark, p)
    val (g, _) = Generations.committedState(spark, p)
    assert(g > orphan, s"generation $orphan reused after crash")
    assert(screen() == before, "post-recovery answers diverged")
    // GC reclaimed the orphan's tables along with the old generation's
    assert(!spark.catalog.tableExists(
      Generations.physical(p, "hashes", orphan)),
      "orphaned generation's tables survived GC")
    Caches.clear()
  }

  test("a crashed multi-table ingest (no commit row) is invisible to " +
    "every read, and stays invisible after later commits") {
    val p = "tgen3"
    Bm25Index.write(docs.filter(col("doc_id") % 5 <= 2), "doc_id",
      "text", p)
    def run() = Bm25Index.search(spark, p, qs).collect().toSeq
    val before = run()
    // all four tables now hold the crashed batch's rows — none visible
    val (g, orphanB) = Bm25Index.appendUncommitted(
      docs.filter(col("doc_id") % 5 === 3), "doc_id", "text", p)
    assert(spark.table(s"${p}_postings").filter(col("b") === orphanB)
      .count() > 0, "the crash simulation wrote nothing")
    assert(run() == before, "uncommitted batch leaked into search")
    Caches.clear()
    // a later, committed batch allocates a FRESH id; committing it must
    // not resurrect the orphan
    Bm25Index.append(docs.filter(col("doc_id") % 5 === 4), "doc_id",
      "text", p)
    val st = Generations.committedState(spark, p)
    assert(st._1 == g && !st._2.contains(orphanB),
      s"orphan batch $orphanB became visible: $st")
    val after = run()
    val expected = CorpusOps.bm25TopK(
      docs.filter(col("doc_id") % 5 <= 2 || col("doc_id") % 5 === 4),
      "doc_id", "text", qs).collect().toSeq
    assert(after == expected,
      "post-crash committed state diverged from the inline ranker")
    Caches.clear()
    // compaction physically drops the orphan rows
    Bm25Index.compact(spark, p)
    val physPost = Generations.physicalFor(spark, p, "postings")
    assert(spark.table(physPost).filter(col("b") === orphanB).isEmpty ||
      orphanB == 0L, "compaction kept crashed-batch rows")
    assert(run() == after, "compaction changed answers")
    Caches.clear()
  }

  test("two concurrent writers: the atomic intent-marker claim " +
    "arbitrates batch ids — the loser detects the collision and " +
    "retries upward; both batches land without overlap, whichever " +
    "commits first") {
    val p = "tgen5"
    Bm25Index.write(docs.filter(col("doc_id") % 5 === 0), "doc_id",
      "text", p)
    // both writers listed the SAME manifest state and computed the
    // same first candidate (1) — the exclusive create arbitrates:
    // exactly one wins id 1, the loser detects the existing marker
    // and claims the next free id
    val bA = Generations.claimBatchFrom(spark, p, 0L, 1L)
    val bB = Generations.claimBatchFrom(spark, p, 0L, 1L)
    assert(bA == 1L && bB == 2L,
      s"claim arbitration failed: A=$bA B=$bB")
    // step-interleaved bodies: A writes, B writes, B commits FIRST
    val dA = docs.filter(col("doc_id") % 5 === 1)
    val dB = docs.filter(col("doc_id") % 5 === 2)
    Bm25Index.writeClaimed(dA, "doc_id", "text", p, 0L, bA)
    Bm25Index.writeClaimed(dB, "doc_id", "text", p, 0L, bB)
    Generations.commit(spark, p, 0L, bB)
    def run() = Bm25Index.search(spark, p, qs).collect().toSeq
    // B visible, A (written but uncommitted) invisible
    assert(Generations.committedState(spark, p) == (0L -> Seq(0L, bB)))
    assert(run() == CorpusOps.bm25TopK(
      docs.filter(col("doc_id") % 5 === 0 || col("doc_id") % 5 === 2),
      "doc_id", "text", qs).collect().toSeq,
      "uncommitted concurrent batch leaked into search")
    Caches.clear()
    // A commits out of order — both batches now visible exactly once
    Generations.commit(spark, p, 0L, bA)
    assert(Generations.committedState(spark, p) ==
      (0L -> Seq(0L, bA, bB)))
    assert(run() == CorpusOps.bm25TopK(
      docs.filter(col("doc_id") % 5 <= 2), "doc_id", "text", qs)
      .collect().toSeq, "interleaved writers diverged from inline")
    Caches.clear()
  }

  test("retention-windowed GC: a reader pinned on the pre-flip " +
    "generation still completes under retain = 1; retain = 0 " +
    "reproduces immediate GC") {
    val p = "tgen6"
    DedupIndex.write(docs.filter(col("doc_id") % 5 <= 1), "doc_id",
      "text", p)
    DedupIndex.append(docs.filter(col("doc_id") % 5 === 2), "doc_id",
      "text", p)
    def screen() = DedupIndex.screenExact(spark,
      docs.filter(col("doc_id") % 5 === 4), "doc_id", "text", p)
      .collect().toSeq
    val before = screen()
    val (gOld, _) = Generations.committedState(spark, p)
    val oldPhys = Generations.physical(p, "hashes", gOld)
    DedupIndex.compact(spark, p, retain = 1)
    val (g1, _) = Generations.committedState(spark, p)
    assert(g1 > gOld)
    // the pre-flip generation survived the flip: a reader that
    // resolved its state before the compaction finishes its scan
    assert(spark.table(oldPhys).count() > 0,
      "retain = 1 dropped the previous generation")
    assert(screen() == before, "answers diverged across retained GC")
    Caches.clear()
    // the next compaction with retain = 0 drops ALL predecessors
    DedupIndex.compact(spark, p, retain = 0)
    assert(!spark.catalog.tableExists(oldPhys),
      "retain = 0 kept a superseded generation")
    assert(!spark.catalog.tableExists(
      Generations.physical(p, "hashes", g1)),
      "retain = 0 kept the immediately-preceding generation")
    assert(screen() == before, "answers diverged after immediate GC")
    Caches.clear()
  }

  test("the manifest stays bounded: micro-batch appends grow it two " +
    "markers per batch, compaction GC resets it to the surviving " +
    "generation's markers") {
    val p = "tgen7"
    DedupIndex.write(docs.filter(col("doc_id") % 10 === 0), "doc_id",
      "text", p)
    // bootstrap is ONE marker (its commit): invisibility-until-commit
    // is structural when no committed generation exists yet
    assert(Generations.rows(spark, p).size == 1)
    for (i <- 1 to 4)
      DedupIndex.append(docs.filter(col("doc_id") % 10 === i),
        "doc_id", "text", p)
    // intent + commit per append
    assert(Generations.rows(spark, p).size == 1 + 2 * 4)
    def screen() = DedupIndex.screenExact(spark,
      docs.filter(col("doc_id") % 5 === 4), "doc_id", "text", p)
      .collect().toSeq
    val before = screen()
    DedupIndex.compact(spark, p)
    // the compacted generation's intent + commit only — dead history
    // deleted with its generations, so streaming ingest cannot grow
    // the manifest without bound
    assert(Generations.rows(spark, p).size == 2,
      s"manifest not compacted: ${Generations.rows(spark, p)}")
    assert(screen() == before, "manifest compaction changed answers")
    Caches.clear()
  }

  test("orphaned-intent GC: crash-looping claims are reaped once a " +
    "later batch commits — the manifest stays bounded and reaped ids " +
    "are never reallocated") {
    val p = "tgen8"
    DedupIndex.write(docs.filter(col("doc_id") % 10 === 0), "doc_id",
      "text", p)
    def screen() = DedupIndex.screenExact(spark,
      docs.filter(col("doc_id") % 5 === 4), "doc_id", "text", p)
      .collect().toSeq
    // five crash-looping writers: each claims an intent, writes
    // nothing, never commits — exactly the residue ADVICE flagged as
    // growing the manifest forever
    val orphans = (1 to 5).map(_ =>
      Generations.beginBatch(spark, p)._2)
    assert(orphans == (1L to 5L), s"claims not sequential: $orphans")
    // a later writer succeeds at a HIGHER id — that commit is what
    // makes the orphans safe to reap
    DedupIndex.append(docs.filter(col("doc_id") % 10 === 1), "doc_id",
      "text", p)
    assert(Generations.rows(spark, p).size == 1 + 5 + 2)
    val before = screen()
    Generations.gc(spark, p,
      Generations.committedState(spark, p)._1, DedupIndex.Logicals)
    // bootstrap commit + the live batch's intent/commit survive; the
    // five orphans are gone — bounded at O(live), not O(crashes)
    val after = Generations.rows(spark, p)
    assert(after.size == 3, s"orphaned intents not reaped: $after")
    assert(screen() == before, "orphan reaping changed answers")
    // a reaped id can never be reallocated: the next claim probes
    // from past the surviving max, not into the reaped range
    val (_, b) = Generations.beginBatch(spark, p)
    assert(b == 7L, s"reaped id reallocated: next claim got $b")
    Caches.clear()
  }

  test("claim-primitive trait boundary: a store WITHOUT atomic " +
    "exclusive create lets two interleaved racers claim the same " +
    "batch id — the documented object-store failure, executable") {
    val p = "tgen9"
    Generations.beginBootstrap(spark, p) // clean slate across sbt runs
    var bB = -1L
    var fired = false
    val saved = Generations.claimPrimitive
    try {
      // writer A's claim is paused between its exists() probe and its
      // create; writer B races the SAME candidate in that window
      Generations.claimPrimitive =
        new Generations.ClaimPrimitive.NonAtomicSimulation(() => {
          if (!fired) {
            fired = true
            bB = Generations.claimBatchFrom(spark, p, 0L, 1L)
          }
        })
      val bA = Generations.claimBatchFrom(spark, p, 0L, 1L)
      // BOTH writers believe they own batch 1 — the torn state the
      // atomic primitive exists to prevent (contrast the two-writer
      // test above, where the default primitive yields 1 and 2)
      assert(bA == 1L && bB == 1L && bA == bB,
        s"expected the double-claim failure: A=$bA B=$bB")
    } finally { Generations.claimPrimitive = saved }
  }

  test("RenameCas conditional-write claim: the SAME adversarial " +
    "interleave that double-claims under the non-atomic double " +
    "yields exactly one winner — the publish call itself arbitrates, " +
    "no exists() probe exists to race") {
    val p = "tgen10"
    Generations.beginBootstrap(spark, p)
    var bB = -1L
    var fired = false
    val saved = Generations.claimPrimitive
    try {
      // writer A is paused between STAGING its proposal and PUBLISHING
      // it — the widest possible window; writer B runs a complete
      // claim of the same candidate inside it and must win, leaving A
      // to detect the loss at publish and retry upward
      Generations.claimPrimitive =
        new Generations.ClaimPrimitive.RenameCas(() => {
          if (!fired) {
            fired = true
            bB = Generations.claimBatchFrom(spark, p, 0L, 1L)
          }
        })
      val bA = Generations.claimBatchFrom(spark, p, 0L, 1L)
      assert(bB == 1L && bA == 2L,
        s"CAS arbitration failed: A=$bA B=$bB")
    } finally { Generations.claimPrimitive = saved }
  }

  test("ConditionalPut claim (the S3-true slot): the injected " +
    "write-iff-absent call is the sole arbiter — same adversarial " +
    "interleave, exactly one winner, no client-side probe") {
    val p = "tgen12"
    Generations.beginBootstrap(spark, p)
    var bB = -1L
    var fired = false
    val saved = Generations.claimPrimitive
    try {
      // the store stand-in: atomic membership arbitration (what a
      // conditional PUT's If-None-Match does server-side), then the
      // winner materializes the zero-byte marker for the manifest's
      // directory listings
      val store = java.util.concurrent.ConcurrentHashMap
        .newKeySet[String]()
      def put(path: org.apache.hadoop.fs.Path): Boolean =
        store.add(path.toString) && {
          val local = java.nio.file.Paths.get(path.toUri.getPath)
          java.nio.file.Files.createDirectories(local.getParent)
          java.nio.file.Files.write(local, Array.emptyByteArray)
          true
        }
      Generations.claimPrimitive =
        new Generations.ClaimPrimitive.ConditionalPut(put, () => {
          if (!fired) {
            fired = true
            bB = Generations.claimBatchFrom(spark, p, 0L, 1L)
          }
        })
      val bA = Generations.claimBatchFrom(spark, p, 0L, 1L)
      assert(bB == 1L && bA == 2L,
        s"conditional-PUT arbitration failed: A=$bA B=$bB")
    } finally { Generations.claimPrimitive = saved }
  }

  test("the full index lifecycle stays green under the conditional-" +
    "write primitive: bootstrap/append/compact/search all claim " +
    "through RenameCas") {
    val saved = Generations.claimPrimitive
    try {
      Generations.claimPrimitive =
        new Generations.ClaimPrimitive.RenameCas()
      val p = "tgen11"
      Bm25Index.write(docs.filter(col("doc_id") % 5 <= 2), "doc_id",
        "text", p)
      Bm25Index.append(docs.filter(col("doc_id") % 5 === 3), "doc_id",
        "text", p)
      Bm25Index.compact(spark, p)
      assert(Bm25Index.search(spark, p, qs).collect().toSeq ==
        CorpusOps.bm25TopK(docs.filter(col("doc_id") % 5 <= 3),
          "doc_id", "text", qs).collect().toSeq,
        "lifecycle under RenameCas diverged from inline")
      Caches.clear()
    } finally { Generations.claimPrimitive = saved }
  }

  test("partial compaction: a small delete log rewrites ONLY the " +
    "tombstoned buckets, copies the rest's files byte-for-byte, and " +
    "answers stay bit-equal across the b0 flip") {
    import spark.implicits._
    // tiny-vocab corpus so the deleted doc's terms pin a SMALL touched
    // set: doc 3's vocab is {qq, rr} — at most 2 postings buckets —
    // and one doc_id — at most 1 doclens bucket
    val corpus = Seq((1L, "aa bb cc dd"), (2L, "aa cc ee"),
      (3L, "qq rr qq"), (4L, "bb dd ff"), (5L, "ee ff aa"))
      .toDF("doc_id", "text")
    val p = "tgen10"
    Bm25Index.write(corpus, "doc_id", "text", p)
    Bm25Index.delete(corpus.filter($"doc_id" === 3L), "doc_id",
      "text", p)
    val qs2 = Seq(("q1", "aa ff"), ("q2", "qq"))
    def run() = Bm25Index.search(spark, p, qs2).collect().toSeq
    val before = run()
    assert(before.nonEmpty)
    val oldFiles = spark.table(s"${p}_doclens").inputFiles.toSet
    val rewritten = Bm25Index.compactPartial(spark, p)
    // the touched sets are delta-sized, not corpus-sized
    assert(rewritten("doclens") <= 1,
      s"doclens rewrote ${rewritten("doclens")} buckets for one doc")
    assert(rewritten("postings") <= 2 && rewritten("positions") <= 2,
      s"term tables rewrote $rewritten buckets for a 2-term doc")
    assert(run() == before, "answers diverged across partial compaction")
    // untouched buckets' files were CARRIED, not rewritten: the new
    // generation's doclens reads mostly the byte-identical file names
    val (g, bs) = Generations.committedState(spark, p)
    assert(g > 0L, "partial compaction did not flip a new generation")
    // the old batch ids stayed visible (carried commits + b0 flip)
    assert(bs.contains(0L) && bs.size >= 2,
      s"carried batch visibility lost: $bs")
    val newFiles = spark.table(
      Generations.physicalFor(spark, p, "doclens")).inputFiles
    val carried = newFiles.count(f =>
      oldFiles.exists(of => of.split("/").last == f.split("/").last))
    assert(carried > 0, "no doclens files were carried over")
    // physical removal happened where it should: doc 3's tombstone
    // and insert rows are gone from the rewritten bucket
    val livePost = spark.table(
      Generations.physicalFor(spark, p, "postings"))
    assert(livePost.filter($"term" === "qq").count() == 0,
      "tombstoned rows survived the touched-bucket rewrite")
    // and the index keeps working for later appends (b0-flip rule:
    // the carried generation is the current one)
    Bm25Index.append(Seq((6L, "aa qq")).toDF("doc_id", "text"),
      "doc_id", "text", p)
    val after = Bm25Index.search(spark, p, qs2).collect().toSeq
    assert(after != before, "post-compaction append was not visible")
    Caches.clear()
  }

  test("refreshFromDiff is all-or-nothing: its takedown and re-append " +
    "legs share one batch id and flip together") {
    import spark.implicits._
    val gen1 = Seq((1L, "a a b"), (2L, "a c"), (3L, "b b d"))
      .toDF("doc_id", "text")
    val gen2 = Seq((1L, "a a b"), (3L, "b b e"), (4L, "d d a"))
      .toDF("doc_id", "text")
    val p = "tgen4"
    Bm25Index.write(gen1, "doc_id", "text", p)
    Bm25Index.refreshFromDiff(gen1, gen2, "doc_id", "text", p)
    // ONE batch beyond bootstrap carries the whole refresh
    val (_, bs) = Generations.committedState(spark, p)
    assert(bs == Seq(0L, 1L), s"refresh used ${bs.size - 1} batches")
    // and both legs' rows carry it: doc 3's tombstones AND doc 4's
    // inserts sit in batch 1
    val b1 = spark.table(s"${p}_postings").filter($"b" === 1L)
    assert(b1.filter($"doc_id" === 3L && $"w" === -1).count() > 0)
    assert(b1.filter($"doc_id" === 4L && $"w" === 1).count() > 0)
    Caches.clear()
  }
}
