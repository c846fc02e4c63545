package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the scale-aware defaults every entry point shares.
  *
  * Local testing runs `local[32]`, but every knob is chosen as if the same
  * plan ran on a 1000-executor cluster: AQE on (runtime coalesce + skew-join
  * splitting), shuffle partitions sized to the parallelism rather than the
  * 200 default, and UTC so date bucketing is deterministic.
  */
object GraftSession {
  def builder(appName: String, cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet has shipped as TIMESTAMP(NANOS), which vanilla
      // Spark rejects outright; this flag reads that layout as Long ns
      // so Tables.normalizeTs can convert it (exactly DuckDB's
      // truncate-to-micros). Harmless for the µs layouts.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // native expression library (graft_to_number_native, …)
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      // the async checksum writer deadlocks state-store checkpoint commits
      // in constrained single-JVM pools (task thread parks forever in
      // ChecksumCheckpointFileManager.awaitResult); local checkpoints are
      // ephemeral so integrity checksums buy nothing here
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")

  def get(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = builder(appName, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
