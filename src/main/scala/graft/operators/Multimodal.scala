package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads as opaque `binary` columns
  * with typed metadata, the way a 100 TB training-data pipeline carries
  * image/audio/video next to text.
  *
  * The DECODE step is STUBBED — this container has no image/audio codecs —
  * behind [[fakeDecode]]: a deterministic md5-derived stand-in with the
  * same schema a real decoder (JNI/FFI or a Python worker via Arrow
  * batches) would produce. Everything around it — the media schema, the
  * metadata extraction, the partition-sized batch shape in
  * [[decodePartitioned]] — is real Spark plumbing and is what the tests
  * and q42 exercise.
  */
object Multimodal {

  /** Canonical media-table schema: id, type, payload, sparse metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("content", BinaryType)))

  /** Adapt the documents table into a media table: the text payload is
    * cast to binary and a deterministic media_type assigned — the stand-in
    * for reading real blobs from object storage.
    */
  def asMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      col("text").cast("binary").as("content"))

  /** STUB decode: deterministic pseudo-dimensions derived from the content
    * hash. A real implementation decodes the payload; the column contract
    * (int width/height per row) is what downstream code depends on.
    */
  def fakeDecode(content: Column): (Column, Column) = {
    val h = conv(substring(md5(content), 1, 7), 16, 10).cast("long")
    ((h % 1920).cast("int"), (h % 1080).cast("int"))
  }

  /** Metadata extraction over the media table: size, content hash, and the
    * (stubbed) decoded dimensions. Pure row-local expressions — scales as
    * a scan.
    */
  def withMeta(media: DataFrame): DataFrame = {
    val (w, h) = fakeDecode(col("content"))
    media
      .withColumn("n_bytes", octet_length(col("content")))
      .withColumn("content_md5", md5(col("content")))
      .withColumn("fake_width", w)
      .withColumn("fake_height", h)
  }

  /** The heavy-decode shape: repartition so each task holds a bounded
    * byte budget (decoders are memory-hungry), then run the decode
    * per-partition. The decode body is the same stub; swap it for the real
    * codec without touching the partitioning contract.
    *
    * The byte budget comes from Catalyst's plan statistics
    * (`optimizedPlan.stats.sizeInBytes`, i.e. file sizes for a scan) — no
    * extra driver-side job, unlike a `count()`. Plans without real
    * statistics (RDD-backed frames, post-shuffle estimates) report
    * `spark.sql.defaultSizeInBytes` = Long.MaxValue; treat any estimate at
    * or above that sentinel as UNKNOWN and fall back to
    * defaultParallelism rather than scheduling millions of tasks on what
    * may be a tiny input. Known estimates are still capped at 1M
    * partitions as a runaway guard.
    */
  def decodePartitioned(media: DataFrame, maxBytesPerTask: Long = 64L << 20): DataFrame = {
    val spark = media.sparkSession
    val n = spark.sparkContext.defaultParallelism
    val estBytes = media.queryExecution.optimizedPlan.stats.sizeInBytes
    // Plans without real statistics report defaultSizeInBytes
    // (Long.MaxValue) — but Catalyst's size-only visitor SCALES that
    // sentinel through projections (a column-pruning select yields e.g.
    // 0.6 × Long.MaxValue: garbage, yet below the sentinel). Treat
    // anything above a 1 PiB plausibility ceiling as unknown, not just
    // the exact sentinel.
    val implausible = BigInt(1L << 50)
    val parts =
      if (estBytes >= implausible) n // stats unusable → size by cluster
      else ((estBytes / maxBytesPerTask) + 1).min(BigInt(1 << 20)).toInt
    withMeta(media.repartition(math.max(n, parts), col("doc_id")))
  }

  /** Frame-sampling stub for video: emit one row per sampled frame index —
    * the explode shape a real frame extractor produces. Sampling every
    * `stride`th frame of a fake frame count derived from n_bytes.
    */
  def sampleFrames(media: DataFrame, stride: Int = 10): DataFrame =
    media
      .withColumn("n_frames", (octet_length(col("content")) / 10).cast("int"))
      .withColumn("frame_idx", explode(
        when(col("n_frames") > 0,
          sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .otherwise(array().cast("array<int>")))) // zero frames → no rows
      .select(col("doc_id"), col("media_type"), col("frame_idx"))
}
