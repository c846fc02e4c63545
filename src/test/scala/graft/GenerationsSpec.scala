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
