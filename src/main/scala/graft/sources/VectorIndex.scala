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

  // ---------------------------------------------------------------
  // PQ-CODED layer — the serving layout a 100 TB vector corpus
  // actually ships: the standing table stores product-quantization
  // CODES (subspaces × one small int each, ~32× smaller than the
  // quantized vectors), the codebook is a persisted bounded table,
  // and search is ADC (probe exact, corpus reconstructed from codes)
  // — [[graft.Similarity.pqAdcTopK]]'s arithmetic over standing
  // tables, with the same w = ±1 tombstone lifecycle as the
  // full-precision layer. Codes are DETERMINISTIC given the codebook
  // (exact integer argmin), so a takedown re-derives its insert's
  // rows bit-for-bit, and search over any live membership is
  // bit-equal to the inline ADC ranker over that membership.
  // ---------------------------------------------------------------

  val Subspaces = 8

  private def codebookT(p: String) = s"${p}_codebook"
  private def codesT(p: String) = s"${p}_codes"

  /** Train + persist the PQ codebook over the TRAINER corpus: per
    * (codeword, dim) floor-normalized integer means (the q134
    * arithmetic — remainder normalized non-negative so engine and
    * oracle floor identically on negative sums), codewords = the
    * trainer's blocks. Rows: (cl, d, cv) — |blocks| × dim, bounded.
    * Trained ONCE per corpus snapshot; every ingest and search reads
    * it back (the build/apply split, as BPE and IVF run it).
    */
  def trainCodebook(df: DataFrame, vecCol: String,
                    blockCol: String, prefix: String): Unit = {
    val spark = df.sparkSession
    val cb = df
      .select(col(blockCol).cast("int").as("cl"),
        Similarity.quantize(col(vecCol)).as("q"))
      .select(col("cl"), posexplode(col("q")).as(Seq("d", "v")))
      .groupBy("cl", "d")
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("cnt"))
      .select(col("cl"), col("d"),
        ((col("sv") - pmod(col("sv"), col("cnt"))) / col("cnt"))
          .cast("long").as("cv"))
    purge(spark, codebookT(prefix))
    cb.coalesce(1).write.mode("errorifexists")
      .saveAsTable(codebookT(prefix))
  }

  /** The bounded codebook read back: (dim, sorted codeword ids,
    * id → full-dim codeword vector). */
  private def loadCodebook(spark: SparkSession, prefix: String)
      : (Int, Seq[Int], Map[Int, Array[Long]]) = {
    val rows = spark.table(codebookT(prefix)).collect()
    require(rows.nonEmpty, s"empty codebook ${codebookT(prefix)}")
    val dim = rows.map(_.getInt(1)).max + 1
    val cb = rows.groupBy(_.getInt(0)).map { case (l, rs) =>
      l -> rs.sortBy(_.getInt(1)).map(_.getLong(2))
    }
    (dim, cb.keys.toSeq.sorted, cb)
  }

  /** One coding pass feeds the codes log; a takedown re-derives the
    * same codes (exact integer argmin against the persisted codebook)
    * with w = -1. Codes are bucketed by block like the full-precision
    * vectors. */
  private def writeAllCodes(df: DataFrame, idCol: String, vecCol: String,
                            blockCol: String, prefix: String, w: Int,
                            mode: String): Unit = {
    val spark = df.sparkSession
    val (dim, labels, cb) = loadCodebook(spark, prefix)
    require(dim % Subspaces == 0, s"dim $dim must split into $Subspaces")
    val subDim = dim / Subspaces
    def codeExpr(s: Int) = {
      val sub = slice(col("q"), s * subDim + 1, subDim)
      array_min(array(labels.map { l =>
        val cv = cb(l).slice(s * subDim, (s + 1) * subDim).toSeq
        struct(
          (Similarity.dotQ(sub, sub) -
            lit(2L) * Similarity.dotQ(sub, typedLit(cv)) +
            lit(cv.map(x => x * x).sum)).as("dist"),
          lit(l).as("l"))
      }: _*)).getField("l")
    }
    val coded = df
      .select(col(blockCol).as("block"), col(idCol).as("vec_id"),
        Similarity.quantize(col(vecCol)).as("q"))
      .select(col("block"), col("vec_id"),
        array((0 until Subspaces).map(codeExpr): _*).as("codes"))
      .withColumn("w", lit(w))
    Sinks.writeBucketed(coded, codesT(prefix), Seq("block"), Buckets,
      mode)
  }

  /** Bootstrap the codes log (codebook must be trained first). */
  def writeCodes(df: DataFrame, idCol: String, vecCol: String,
                 blockCol: String, prefix: String): Unit =
    writeAllCodes(df, idCol, vecCol, blockCol, prefix, w = 1,
      mode = "overwrite")

  def appendCodes(df: DataFrame, idCol: String, vecCol: String,
                  blockCol: String, prefix: String): Unit =
    writeAllCodes(df, idCol, vecCol, blockCol, prefix, w = 1,
      mode = "append")

  def deleteCodes(df: DataFrame, idCol: String, vecCol: String,
                  blockCol: String, prefix: String): Unit =
    writeAllCodes(df, idCol, vecCol, blockCol, prefix, w = -1,
      mode = "append")

  /** ADC search over the standing codes: probes exact (the
    * [[graft.Similarity.probes]] projection), corpus reconstructed
    * row-locally from codes via the broadcast-bounded codebook map —
    * no raw or full-precision vector is ever read. Bit-equal to
    * [[graft.Similarity.pqAdcTopK]] over the same live membership
    * (same argmin codes, same reconstruction, same ranking — the
    * q162 gate). The probe side broadcasts against the in-bucket
    * liveness fold; the inequality join is the ANN family's bounded
    * nested loop (the q39/q135 shape).
    */
  def searchAdc(spark: SparkSession, prefix: String, probes: DataFrame,
                k: Int): DataFrame = {
    val (dim, labels, cb) = loadCodebook(spark, prefix)
    // same guard as the coding path: a retrained non-divisible
    // codebook must fail loudly, not silently truncate reconstruction
    require(dim % Subspaces == 0, s"dim $dim must split into $Subspaces")
    val subDim = dim / Subspaces
    val live = spark.table(codesT(prefix))
      .groupBy("block", "vec_id", "codes")
      .agg(sum(col("w")).as("net")).filter(col("net") > 0)
      .select("vec_id", "codes")
    val r = concat((0 until Subspaces).map { s =>
      val subMap = labels.map(l =>
        l -> cb(l).slice(s * subDim, (s + 1) * subDim).toSeq).toMap
      element_at(typedLit(subMap), col("codes").getItem(s))
    }: _*)
    val recon = live.withColumn("r", r)
      .withColumn("rnorm2", Similarity.dotQ(col("r"), col("r")))
    val scored = recon.join(broadcast(probes),
        col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        (Similarity.dotQ(col("pq"), col("r")) /
          (sqrt(col("pnorm2").cast("double")) *
            sqrt(col("rnorm2").cast("double")))).as("cosine"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "rank", "neighbor_id", "cosine")
  }

  /** Compact the codes log to one live file per bucket. */
  def compactCodes(spark: SparkSession, prefix: String): Unit =
    Sinks.compactBucketed(spark, codesT(prefix), Seq("block"), Buckets)

  private def purge(spark: SparkSession, table: String): Unit =
    Sinks.purgeTable(spark, table)
}
