package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Caches, Similarity}

/** Standing ANN INDEX — the [[DedupIndex]]/[[Bm25Index]] lifecycle
  * discipline applied to the vector-similarity family, so a 100 TB
  * embedding corpus is ingested once and served forever without
  * re-reading or re-aggregating raw vectors per probe batch
  * ([[graft.Similarity.ivfTopK]] with an inline build is the one-job
  * form; [[graft.Similarity.buildIvf]] persists centroids but still
  * scans the raw corpus per search and has no takedown path):
  *
  *  - `<prefix>_vectors`   (block, vec_id, q, norm2, w)  bucketed by block
  *  - `<prefix>_centroids` (block, cq, cnt, w)           per-batch log
  *
  * Both tables are LOG-STRUCTURED with the w = ±1 weight discipline:
  * [[append]] writes the batch's quantized vectors plus its PER-BLOCK
  * PARTIAL SUM VECTORS with w = +1, [[delete]] re-derives the same
  * rows with w = -1, and [[search]] folds liveness in-bucket. The
  * centroid log is the novel piece: a centroid here is an integer sum
  * vector ([[graft.Similarity.ivfCentroids]]'s representation), which
  * is a MERGEABLE aggregate — the live centroid of a block is the
  * elementwise signed sum of its per-batch partials, so ingest never
  * touches previously indexed vectors and a takedown's negative
  * partial cancels its insert exactly (integer arithmetic — no drift).
  * This is the partial-aggregation-as-index-rows posture: the index
  * maintains the map-side combine output, and search finishes the
  * reduce over a |blocks × batches|-row table instead of the corpus.
  *
  * [[search]] is [[graft.Similarity.ivfTopK]]'s routed shape against
  * the standing tables: probes broadcast against the folded centroids
  * (nprobe nearest by exact integer cosine), the routed frame
  * broadcasts against the live vectors on the bucket key — the corpus
  * side is never shuffled — and the per-probe top-k window finishes.
  * Bit-equal to `ivfTopK` over the same live membership because every
  * stage commutes: net sums equal one-shot sums, and the liveness
  * fold's grouping leads with the bucket key (zero-Exchange,
  * LlmOpsSpec pins it). [[compact]] rewrites the vectors table to one
  * file per bucket and nets the centroid log to one row per block.
  * Single-writer-batch posture like [[DedupIndex]].
  */
object VectorIndex {

  val Buckets = 16

  private def vectors(p: String) = s"${p}_vectors"
  private def centroids(p: String) = s"${p}_centroids"

  /** One quantization pass feeds both tables; a takedown (w = -1)
    * re-derives rows matching its insert bit-for-bit. */
  private def writeAll(df: DataFrame, idCol: String, vecCol: String,
                       blockCol: String, prefix: String, w: Int,
                       mode: String): Unit = {
    val spark = df.sparkSession
    val vecs = Caches.persistTracked(
      df.select(col(blockCol).as("block"), col(idCol).as("vec_id"),
          Similarity.quantize(col(vecCol)).as("q"))
        .withColumn("norm2", Similarity.dotQ(col("q"), col("q"))))
    Sinks.writeBucketed(vecs.withColumn("w", lit(w)),
      vectors(prefix), Seq("block"), Buckets, mode)
    val partial = vecs
      .select(col("block"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy("block", "pos").agg(sum("v").as("s"))
      .groupBy("block")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("s")))),
        p => p.getField("s")).as("cq"))
      .join(vecs.groupBy("block").agg(count(lit(1)).as("cnt")),
        Seq("block"))
      .withColumn("w", lit(w))
    if (mode == "overwrite") purge(spark, centroids(prefix))
    partial.write.mode(if (mode == "overwrite") "errorifexists" else mode)
      .saveAsTable(centroids(prefix))
  }

  /** Bootstrap from a corpus snapshot; steady state is
    * [[append]]/[[delete]] only. */
  def write(df: DataFrame, idCol: String, vecCol: String,
            blockCol: String, prefix: String): Unit =
    writeAll(df, idCol, vecCol, blockCol, prefix, w = 1,
      mode = "overwrite")

  /** Fold a new batch in (id-unique contract: appended vec_ids are
    * new). Pure row-appends — one file per bucket per batch plus a
    * |blocks|-row centroid partial. */
  def append(df: DataFrame, idCol: String, vecCol: String,
             blockCol: String, prefix: String): Unit =
    writeAll(df, idCol, vecCol, blockCol, prefix, w = 1, mode = "append")

  /** Takedown: the same projections with w = -1 — the centroid
    * partial cancels the insert's exactly (integer sums). */
  def delete(df: DataFrame, idCol: String, vecCol: String,
             blockCol: String, prefix: String): Unit =
    writeAll(df, idCol, vecCol, blockCol, prefix, w = -1, mode = "append")

  /** Finish the centroid reduce over the signed partial log: blocks
    * with a live member count, their net sum vector and its norm. The
    * log is |blocks × batches| rows — broadcast-sized by construction.
    */
  private def liveCentroids(spark: SparkSession,
                            prefix: String): DataFrame =
    spark.table(centroids(prefix))
      .select(col("block"), col("w"), col("cnt"),
        posexplode(col("cq")).as(Seq("pos", "v")))
      .groupBy("block", "pos")
      .agg(sum(col("v") * col("w")).as("s"),
        sum(col("cnt") * col("w")).as("net_cnt"))
      .filter(col("net_cnt") > 0)
      .groupBy("block")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("s")))),
        p => p.getField("s")).as("cq"))
      .withColumn("cnorm2", Similarity.dotQ(col("cq"), col("cq")))

  /** Route + rank a bounded probe batch (probe_id, pq, pnorm2 — see
    * [[graft.Similarity.probes]]) against the live index: nprobe
    * nearest centroids per probe by exact integer cosine, then top-k
    * over only the routed blocks' live vectors. No raw corpus is
    * touched and the vectors table is never shuffled: the liveness
    * fold groups leading with the bucket key and the routed frame
    * broadcasts into the bucket-partitioned scan.
    */
  def search(spark: SparkSession, prefix: String, probes: DataFrame,
             k: Int, nprobe: Int = 1): DataFrame = {
    val cent = liveCentroids(spark, prefix)
    val wc = Window.partitionBy("probe_id")
      .orderBy(col("ccos").desc, col("block").asc)
    val routed = Caches.persistTracked(
      probes.crossJoin(broadcast(cent))
        .withColumn("ccos", Similarity.cosineQ(col("pq"), col("cq"),
          col("pnorm2"), col("cnorm2")))
        .withColumn("rn", row_number().over(wc))
        .filter(col("rn") <= nprobe)
        .select(col("probe_id"), col("pq"), col("pnorm2"), col("block")))
    // the index LOOKUP (the Bm25Index.search lesson): the routed block
    // list is bounded by the broadcast-sized centroid table, so it
    // pushes into the vectors scan as a STATIC In(block, …) predicate
    // — parquet row-group pruning over the block-sorted buckets skips
    // unrouted clusters before any fold or join. The liveness fold
    // then runs over routed rows only — filter and fold commute
    // because the fold's grouping includes `block`.
    val routedBlocks = routed.select("block").distinct()
      .collect().map(_.get(0)).toSeq
    val live = spark.table(vectors(prefix))
      .filter(col("block").isin(routedBlocks: _*))
      .groupBy("block", "vec_id", "q", "norm2")
      .agg(sum(col("w")).as("net")).filter(col("net") > 0)
      .select("block", "vec_id", "q", "norm2")
    val scored = live.join(broadcast(routed), Seq("block"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        Similarity.cosineQ(col("pq"), col("q"), col("pnorm2"),
          col("norm2")).as("cosine"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "rank", "neighbor_id", "cosine")
  }

  /** SEMANTIC INGEST SCREEN — the [[DedupIndex]] screen-before-append
    * posture for vectors: each arriving vector is checked for a
    * semantic duplicate already LIVE in the index (same block — the
    * SemDeDup cluster-scoping argument — with cosine ≥ tauNum/tauDen),
    * reporting `is_known` and the canonical (minimum) live vec_id it
    * duplicates. The threshold test is EXACT integer arithmetic (the
    * q156 pattern): dot > 0 ∧ tauDen²·dot² ≥ tauNum²·‖x‖²‖y‖² — no
    * float compare, so engine and oracle can never disagree at the
    * boundary. Magnitude guard: |q| ≤ 1000 per dim ⇒ dot² ≤ 4.1e15 and
    * the default 19/20 multipliers keep both sides under 2e18 < int64.
    *
    * Scale shape: the batch's distinct block list is bounded by the
    * centroid table, so it pushes into the vectors scan as a static
    * In(block, …) predicate (the [[search]]/[[Bm25Index]] lesson); the
    * screen join is block-equi against the in-bucket liveness fold —
    * the standing corpus is read in place, never shuffled, and only
    * the batch's own blocks are read at all.
    */
  def screenSemantic(spark: SparkSession, batch: DataFrame,
                     idCol: String, vecCol: String, blockCol: String,
                     prefix: String, tauNum: Long = 19,
                     tauDen: Long = 20): DataFrame = {
    val b = Caches.persistTracked(
      batch.select(col(blockCol).as("block"), col(idCol).as("vec_id"),
          Similarity.quantize(col(vecCol)).as("q"))
        .withColumn("norm2", Similarity.dotQ(col("q"), col("q"))))
    val blocks = b.select("block").distinct()
      .collect().map(_.get(0)).toSeq
    val live = spark.table(vectors(prefix))
      .filter(col("block").isin(blocks: _*))
      .groupBy("block", "vec_id", "q", "norm2")
      .agg(sum(col("w")).as("net")).filter(col("net") > 0)
      .select(col("block"), col("vec_id").as("old_id"),
        col("q").as("oq"), col("norm2").as("on2"))
    val dot = Similarity.dotQ(col("q"), col("oq"))
    val hit = b.join(live, Seq("block"))
      .filter(dot > 0 &&
        dot * dot * lit(tauDen * tauDen) >=
          col("norm2") * col("on2") * lit(tauNum * tauNum))
      .groupBy("vec_id").agg(min(col("old_id")).as("canonical_id"))
    b.select("vec_id").join(hit, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("canonical_id"),
        col("canonical_id").isNotNull.as("is_known"))
  }

  /** Compact: vectors to one live file per bucket
    * ([[Sinks.compactBucketed]] — tombstoned pairs physically drop),
    * centroid log netted to one row per block (w = 1), the
    * [[Bm25Index.compact]] stats posture. */
  def compact(spark: SparkSession, prefix: String): Unit = {
    Sinks.compactBucketed(spark, vectors(prefix), Seq("block"), Buckets)
    val net = liveCentroids(spark, prefix)
      .join(spark.table(centroids(prefix))
          .groupBy("block")
          .agg(sum(col("cnt") * col("w")).as("cnt")),
        Seq("block"))
      .select(col("block"), col("cq"), col("cnt"), lit(1).as("w"))
    val tmp = centroids(prefix) + "_compacting"
    purge(spark, tmp)
    net.coalesce(1).write.mode("overwrite").saveAsTable(tmp)
    purge(spark, centroids(prefix))
    spark.sql(s"ALTER TABLE $tmp RENAME TO ${centroids(prefix)}")
  }

  private def purge(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, table)
    loc.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(loc, true)
  }
}
