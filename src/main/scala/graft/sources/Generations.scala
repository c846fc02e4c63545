package graft.sources

import org.apache.spark.sql.SparkSession

/** ATOMIC COMMIT for the standing-index family — the missing
  * transactional layer over [[DedupIndex]]/[[Bm25Index]]/[[VectorIndex]]/
  * [[StatsLedger]]'s log-structured parquet tables (the reference's
  * analogue is Postgres' transactional MERGE,
  * reid/pipelines/property.py:96-126; at corpus scale the same guarantee
  * comes from a manifest, which is how Delta/Iceberg commit).
  *
  * One tiny `<prefix>_manifest` table per index records the commit log:
  * rows (gen, b, state) where `gen` is a physical-table GENERATION
  * (compaction rewrites into a NEW generation's tables and flips here),
  * `b` is a BATCH id within a generation (every ingest/takedown/refresh
  * stamps its rows with one `b`), and `state` is `intent` (allocated,
  * data may be partially written) or `commit` (fully written, visible).
  *
  * The protocol — single WRITER, any number of readers:
  *
  *  1. a writer first appends an `intent` row (allocating a fresh `b`
  *     or `gen` that no future writer will reuse, even after a crash),
  *  2. writes ALL its data rows stamped with that (gen, b) — across
  *     however many physical tables the index keeps,
  *  3. commits by appending ONE `commit` manifest row.
  *
  * Readers resolve the manifest ONCE per operation: current generation
  * = max gen carrying a commit, visible batches = that generation's
  * committed `b` list — then filter every table scan to
  * `b IN (visible)`. The batch list is bounded (it grows only until the
  * next compaction resets it), so the predicate reaches the parquet
  * scan as a static filter. Consequences:
  *
  *  - a crash between steps 2 and 3 leaves orphan rows that are
  *    INVISIBLE forever (their `b` is never committed and never
  *    reallocated) and are physically dropped at the next compaction;
  *  - a multi-table ingest (Bm25Index writes four tables) or a
  *    two-legged refresh (takedown + re-append under ONE `b`) is
  *    all-or-nothing — no reader ever sees a half-applied batch;
  *  - compaction builds the ENTIRE next generation's tables while
  *    readers keep resolving the old one, then flips visibility with
  *    the single commit-row append — no purge-then-rename window, the
  *    index is never missing or mixed-generation (GenerationsSpec
  *    simulates the interrupted compaction);
  *  - old generations are garbage-collected AFTER the flip ([[gc]]);
  *    a crash before GC leaves unreferenced tables, never an
  *    inconsistent read. Immediate GC assumes no reader is still
  *    mid-scan on the old generation — a deployment with long-running
  *    readers defers GC by a retention window, exactly as Delta VACUUM
  *    does.
  *
  * The one-row commit append is atomic under parquet's task-commit
  * rename on HDFS/local file systems; an object store without atomic
  * rename wants the manifest on a consistent catalog (the same caveat
  * every file-format transaction log carries).
  */
object Generations {

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

  private def rows(spark: SparkSession,
                   prefix: String): Seq[(Long, Long, String)] =
    spark.table(manifestT(prefix)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq

  private def writeRow(spark: SparkSession, prefix: String, gen: Long,
                       b: Long, state: String, mode: String): Unit = {
    val s = spark
    import s.implicits._
    Seq((gen, b, state)).toDF("gen", "b", "state")
      .coalesce(1).write.mode(mode).saveAsTable(manifestT(prefix))
  }

  /** Start a fresh index: reset the manifest and record the bootstrap
    * intent (gen 0, batch 0). Until [[commit]] lands the index has no
    * committed generation and readers refuse it — bootstrap is the one
    * write with nothing prior to stay readable. */
  def beginBootstrap(spark: SparkSession, prefix: String): Unit = {
    Sinks.purgeTable(spark, manifestT(prefix))
    writeRow(spark, prefix, 0L, 0L, "intent", "errorifexists")
  }

  /** Allocate the next batch id in the current committed generation and
    * record its intent. Crashed allocations are never reused: the max
    * runs over intents too. */
  def beginBatch(spark: SparkSession, prefix: String): (Long, Long) = {
    val rs = rows(spark, prefix)
    val committed = rs.filter(_._3 == "commit").map(_._1)
    require(committed.nonEmpty,
      s"${manifestT(prefix)}: no committed generation to append to")
    val g = committed.max
    val b = rs.filter(_._1 == g).map(_._2).max + 1
    writeRow(spark, prefix, g, b, "intent", "append")
    (g, b)
  }

  /** Allocate the next generation (for compaction's full rewrite) and
    * record its intent. */
  def beginGeneration(spark: SparkSession, prefix: String): Long = {
    val rs = rows(spark, prefix)
    require(rs.exists(_._3 == "commit"),
      s"${manifestT(prefix)}: no committed generation to compact")
    val ng = rs.map(_._1).max + 1
    writeRow(spark, prefix, ng, 0L, "intent", "append")
    ng
  }

  /** The commit point: ONE appended row makes batch `b` of `gen` (and,
    * if it is a new generation's first, the whole generation) visible. */
  def commit(spark: SparkSession, prefix: String, gen: Long,
             b: Long): Unit =
    writeRow(spark, prefix, gen, b, "commit", "append")

  /** Reader resolution: (current committed generation, its visible
    * batch ids, sorted). One bounded manifest collect per operation. */
  def committedState(spark: SparkSession,
                     prefix: String): (Long, Seq[Long]) = {
    val committed = rows(spark, prefix).filter(_._3 == "commit")
    require(committed.nonEmpty,
      s"${manifestT(prefix)}: no committed generation")
    val g = committed.map(_._1).max
    (g, committed.filter(_._1 == g).map(_._2).distinct.sorted)
  }

  /** Drop every non-current generation's physical tables (committed
    * predecessors AND crashed intents). Runs strictly AFTER the flip;
    * idempotent, so a crash mid-GC just re-runs later. */
  def gc(spark: SparkSession, prefix: String, keepGen: Long,
         logicals: Seq[String]): Unit =
    rows(spark, prefix).map(_._1).distinct.filter(_ != keepGen)
      .foreach(g => logicals.foreach(l =>
        Sinks.purgeTable(spark, physical(prefix, l, g))))
}
