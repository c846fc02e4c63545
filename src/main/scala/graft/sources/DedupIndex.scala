package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Caches, TextOps}

/** Standing-index lifecycle for the incremental dedup screens — the
  * production piece [[graft.TextOps.incrementalNearDup]] /
  * [[graft.TextOps.incrementalExactDedup]] deliberately leave out (they
  * rebuild the old side from the snapshot per run; fine for one query,
  * wrong for a daily ingest over a 100 TB corpus that must not re-hash
  * itself every increment).
  *
  * Three bucketed tables per index (reference-analog: the monthly
  * re-crawl merge state, reid/pipelines/property.py:96-126, kept at
  * corpus scale):
  *
  *  - `<prefix>_bands`  (doc_id, band, key)   bucketed by (band, key)
  *  - `<prefix>_shsets` (doc_id, shset)       bucketed by doc_id
  *  - `<prefix>_hashes` (content_hash, doc_id) bucketed by content_hash
  *
  * Bucketing IS the design: each screen join's corpus side reads
  * pre-partitioned on its join key, so the only Exchange in the probe
  * plan is the increment's own (PlanShapeSpec pins this). The hash
  * table is LOG-STRUCTURED — [[append]] is a pure row-append in every
  * table (no read-modify-write, so appends never rewrite corpus data);
  * [[screenExact]] re-derives the canonical id with an in-bucket
  * `min(doc_id)` per hash, which is exchange-free because the groupBy
  * key is the bucket key.
  *
  * Single-writer-batch posture, like [[Sinks.constrainedAppend]]:
  * concurrent appends would need a transactional table format.
  */
object DedupIndex {

  /** Bucket count: sized to the local parallelism; on a real cluster
    * this is a deployment knob (buckets ≥ executor cores, and the
    * probe side's shuffle lands on exactly this many partitions).
    */
  val Buckets = 32

  private def bands(prefix: String) = s"${prefix}_bands"
  private def shsets(prefix: String) = s"${prefix}_shsets"
  private def hashes(prefix: String) = s"${prefix}_hashes"

  /** The per-increment hashing pass shared by [[write]] and [[append]]:
    * one persisted projection feeds the band rows, the shingle-set rows
    * and the content-hash rows, so a document is tokenized and hashed
    * exactly once per ingest.
    */
  private def project(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val sh = Caches.persistTracked(docs.select(col(idCol).as("doc_id"),
      TextOps.hashedShingleSet(col(textCol)).as("shset"),
      md5(col(textCol)).as("content_hash")))
    (TextOps.bandedKeys(sh.select("doc_id", "shset"), "doc_id"),
      sh.select("doc_id", "shset"),
      sh.select("content_hash", "doc_id"))
  }

  private def save(df: DataFrame, table: String, mode: String,
                   bucketCols: Seq[String]): Unit =
    Sinks.writeBucketed(df, table, bucketCols, Buckets, mode)

  /** (Re)build the standing index from a corpus snapshot — the one-time
    * bootstrap write ([[Sinks.writeBucketed]] purges any stale location
    * from a previous session). Steady state never calls this again:
    * increments fold in via [[append]].
    */
  def write(docs: DataFrame, idCol: String, textCol: String,
            prefix: String): Unit = {
    val (b, s, h) = project(docs, idCol, textCol)
    save(b, bands(prefix), "overwrite", Seq("band", "key"))
    save(s, shsets(prefix), "overwrite", Seq("doc_id"))
    save(h, hashes(prefix), "overwrite", Seq("content_hash"))
  }

  /** Fold an accepted increment into the standing index. Appends only —
    * each batch adds one file per bucket and the corpus is never
    * rewritten; Spark unions bucket files at read, so the bucketed
    * read-side guarantee survives any number of appends. (A compaction
    * pass — rewrite a bucket's files into one — is an offline
    * maintenance job, not part of the ingest loop.)
    */
  def append(increment: DataFrame, idCol: String, textCol: String,
             prefix: String): Unit = {
    val (b, s, h) = project(increment, idCol, textCol)
    save(b, bands(prefix), "append", Seq("band", "key"))
    save(s, shsets(prefix), "append", Seq("doc_id"))
    save(h, hashes(prefix), "append", Seq("content_hash"))
  }

  /** Screen a new batch against the standing index: banded-LSH
    * candidates from the index only, exact-Jaccard verify against the
    * stored shingle sets, best-match verdict at `threshold` — bit-equal
    * to [[graft.TextOps.incrementalNearDup]] over the same membership
    * split (the q98-vs-q92 gate). The increment is hashed here, once;
    * the corpus side is only ever read.
    */
  def screenNearDup(spark: SparkSession, batch: DataFrame, idCol: String,
                    textCol: String, prefix: String,
                    threshold: Double = 0.8): DataFrame = {
    val newSh = Caches.persistTracked(batch.select(col(idCol).as("doc_id"),
      TextOps.hashedShingleSet(col(textCol)).as("shset")))
    TextOps.incrementalNearDupProbe(
      spark.table(bands(prefix)).select(col("doc_id").as("old_id"),
        col("band"), col("key")),
      spark.table(shsets(prefix)), newSh, threshold)
  }

  /** Screen a new batch against the standing hash table — bit-equal to
    * [[graft.TextOps.incrementalExactDedup]] over the same membership
    * split (the q99-vs-q97 gate). The canonical id is re-derived as an
    * in-bucket `min(doc_id)` per hash over the log-structured table:
    * both the aggregate and the probe join key on `content_hash`, the
    * bucket key, so the corpus side plans zero Exchanges.
    */
  def screenExact(spark: SparkSession, batch: DataFrame, idCol: String,
                  textCol: String, prefix: String): DataFrame = {
    val oldCanon = spark.table(hashes(prefix))
      .groupBy("content_hash").agg(min(col("doc_id")).as("canonical_id"))
    batch.select(col(idCol).as("doc_id"),
        md5(col(textCol)).as("content_hash"))
      .join(oldCanon, Seq("content_hash"), "left_outer")
      .select(col("doc_id"), col("content_hash"), col("canonical_id"),
        col("canonical_id").isNotNull.as("is_known"))
      .orderBy("doc_id")
  }
}
