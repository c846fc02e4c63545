package graft.streaming

import java.time.LocalDate
import graft.Merge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming layer over the batch incremental semantics
  * (SURVEY §2.9): the reference's monthly crawl → upsert cycle becomes a
  * `readStream → foreachBatch(merge)` pipeline, so the same MERGE rule
  * matrix (Merge.merge) serves both batch backfills and continuous
  * ingestion unchanged.
  *
  * State model: the canonical listing table lives in a path (parquet);
  * each micro-batch full-outer merges into it and atomically swaps the
  * snapshot. At cluster scale the swap becomes a transactional table
  * format commit — the merge job is identical.
  */
object IncrementalPipeline {

  /** Merge one micro-batch of standardized listings into the canonical
    * snapshot at `tablePath` (read-modify-swap; `asOf` pins every stamp).
    */
  def mergeBatch(spark: SparkSession, batch: DataFrame, tablePath: String,
                 asOf: LocalDate): Unit = {
    // crash recovery: if the previous swap died between its two renames,
    // the snapshot survives only at _old — restore it before merging,
    // otherwise the batch would merge against an empty table
    val target0 = new java.io.File(tablePath)
    val old0 = new java.io.File(tablePath + "_old")
    if (!target0.exists() && old0.isDirectory) {
      if (!old0.renameTo(target0))
        throw new java.io.IOException(s"snapshot recovery failed: $old0 -> $tablePath")
    }
    val dir = new java.io.File(tablePath)
    val current =
      if (dir.isDirectory && dir.list().exists(_.endsWith(".parquet")))
        spark.read.parquet(tablePath)
      else
        batch.limit(0) // empty current table, batch schema
    val merged = Merge.merge(current, batch, asOf)
      .drop("changes", "is_new", "changed")
    val tmp = tablePath + "_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    // atomic-enough swap for a local snapshot; a table format does this
    // transactionally on a cluster
    val target = new java.io.File(tablePath)
    if (target.exists()) {
      val old = new java.io.File(tablePath + "_old")
      deleteRec(old)
      if (!target.renameTo(old))
        throw new java.io.IOException(s"snapshot swap failed: $tablePath -> $old")
    }
    if (!new java.io.File(tmp).renameTo(target))
      throw new java.io.IOException(s"snapshot swap failed: $tmp -> $tablePath")
  }

  /** Wire a streaming source of standardized listing rows into the merge.
    * Works with any streaming DataFrame (file source, Kafka, memory).
    */
  def start(listings: DataFrame, tablePath: String, asOf: LocalDate,
            checkpoint: String): StreamingQuery =
    listings.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, batch, tablePath, asOf)
      }
      .start()

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    if (f.exists()) f.delete()
  }
}
