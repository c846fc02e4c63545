package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Caches, CorpusOps, TextOps}

/** Standing RETRIEVAL index for the BM25 ranker — the production piece
  * [[graft.operators.CorpusOps.bm25TopK]] deliberately leaves out (it
  * re-tokenizes and re-aggregates the corpus per query batch; fine for
  * one job, wrong for a serving path over a 100 TB corpus that must
  * not re-read its text for every query). The [[DedupIndex]] lifecycle
  * discipline applied to the IR family:
  *
  *  - `<prefix>_postings` (term, doc_id, tf, w)  bucketed by term
  *  - `<prefix>_doclens`  (doc_id, dl, w)        bucketed by doc_id
  *  - `<prefix>_stats`    (n, tt)                log of signed batch rows
  *
  * All three are LOG-STRUCTURED with the DedupIndex weight discipline:
  * [[append]] writes projections with w = +1, [[delete]] re-derives
  * the SAME rows with w = -1 (takedowns are row-appends, never
  * rewrites), and every [[search]] folds liveness with an IN-BUCKET
  * `sum(w) > 0` aggregate — the postings fold groups on (term, doc_id,
  * tf) leading with the bucket key, so tombstone filtering costs the
  * corpus side zero Exchange. The stats log stores signed per-batch
  * (n, tt) rows whose running sum is the live corpus size — one tiny
  * scan, no doclens pass at query time.
  *
  * [[search]] joins the postings against the broadcast query-term
  * table FIRST (bucket-key join, no corpus shuffle), computes df over
  * the matched postings only (in-bucket aggregate on `term`), and
  * hands the (query_id, doc_id, term, tf) frame to the SHARED
  * [[CorpusOps.bm25Rank]] scoring tail — bit-equal to the inline
  * ranker over the same live membership by construction (the
  * q98-vs-q92 argument: the index IS the corpus projection,
  * persisted). Single-writer-batch posture like [[DedupIndex]].
  */
object Bm25Index {

  val Buckets = 32

  private def postings(p: String) = s"${p}_postings"
  private def doclens(p: String) = s"${p}_doclens"
  private def stats(p: String) = s"${p}_stats"
  private def positions(p: String) = s"${p}_positions"

  /** One tokenization per ingest feeds all four tables; a takedown
    * (w = -1) re-derives rows that match its insert bit-for-bit. The
    * POSITIONAL postings (term, doc_id, pos) are the classic IR
    * positional index — ~dl rows per doc (vs distinct-term rows for
    * the tf postings), bucketed by term like the tf table so
    * [[phraseSearch]]'s per-term probes read pre-partitioned.
    */
  private def writeAll(docs: DataFrame, idCol: String, textCol: String,
                       prefix: String, w: Int, mode: String): Unit = {
    val spark = docs.sparkSession
    val toks = Caches.persistTracked(docs.select(
      col(idCol).as("doc_id"),
      posexplode(TextOps.words(col(textCol))).as(Seq("pos", "term"))))
    val post = toks.groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf")).withColumn("w", lit(w))
    val dls = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      .withColumn("w", lit(w))
    Sinks.writeBucketed(post, postings(prefix), Seq("term"), Buckets, mode)
    Sinks.writeBucketed(dls, doclens(prefix), Seq("doc_id"), Buckets, mode)
    Sinks.writeBucketed(toks.select("term", "doc_id", "pos")
      .withColumn("w", lit(w)),
      positions(prefix), Seq("term"), Buckets, mode)
    val st = dls.agg((count(lit(1)) * w).as("n"),
      (coalesce(sum(col("dl")), lit(0L)) * w).as("tt"))
    if (mode == "overwrite") Sinks.purgeTable(spark, stats(prefix))
    st.write.mode(mode).saveAsTable(stats(prefix))
  }

  /** Bootstrap the index from a corpus snapshot; steady state uses
    * [[append]]/[[delete]] only. */
  def write(docs: DataFrame, idCol: String, textCol: String,
            prefix: String): Unit =
    writeAll(docs, idCol, textCol, prefix, w = 1, mode = "overwrite")

  /** Fold a NEW batch in (id-unique contract: appended doc_ids are
    * new). Pure row-appends, one file per bucket per batch. */
  def append(increment: DataFrame, idCol: String, textCol: String,
             prefix: String): Unit =
    writeAll(increment, idCol, textCol, prefix, w = 1, mode = "append")

  /** Takedown: append the same projections with w = -1; the search
    * fold nets them dead and the stats sum shrinks accordingly. */
  def delete(docs: DataFrame, idCol: String, textCol: String,
             prefix: String): Unit =
    writeAll(docs, idCol, textCol, prefix, w = -1, mode = "append")

  private def live(spark: SparkSession, table: String,
                   dataCols: Seq[String]): DataFrame =
    spark.table(table)
      .groupBy(dataCols.map(col): _*)
      .agg(sum(col("w")).as("net"))
      .filter(col("net") > 0)
      .select(dataCols.map(col): _*)

  /** Rank the live index against a query batch — bit-equal to
    * [[CorpusOps.bm25TopK]] over the same live corpus (the q154 gate).
    * No corpus text is touched: postings carry tf, doclens carry dl,
    * and the stats log's running sum yields N/avgdl as one bounded
    * driver scalar.
    */
  def search(spark: SparkSession, prefix: String,
             queries: Seq[(String, String)], k: Int = 10,
             k1Milli: Long = 1200L, bMilli: Long = 750L): DataFrame = {
    val st = spark.table(stats(prefix))
      .agg(coalesce(sum(col("n")), lit(0L)).as("n"),
        coalesce(sum(col("tt")), lit(0L)).as("tt")).head()
    val n = st.getLong(0)
    require(n > 0, "Bm25Index.search needs a non-empty live index")
    val avgdlMilli = st.getLong(1) * 1000L / n
    val qterms = CorpusOps.bm25QueryTerms(spark, queries)
    // the index LOOKUP: query terms are a bounded driver-side list, so
    // they push into the postings scan as a STATIC In(term, …) filter
    // — parquet row-group pruning over the term-sorted buckets skips
    // the corpus's unmatched vocabulary before any fold or join (the
    // whole-log-then-filter formulation measured 1.0× vs inline on the
    // bm25-ab probe; restriction must reach the scan). The liveness
    // fold then runs over matched rows only — filter and fold commute
    // because the fold's grouping includes `term`.
    val terms = queries.flatMap(_._2.trim.split("\\s+")).distinct
    val matched = Caches.persistTracked(
      spark.table(postings(prefix))
        .filter(col("term").isin(terms: _*))
        .groupBy("term", "doc_id", "tf")
        .agg(sum(col("w")).as("net")).filter(col("net") > 0)
        .select("term", "doc_id", "tf"))
    val dfr = matched.groupBy("term").agg(count(lit(1)).as("df"))
    val tf = matched.join(broadcast(qterms), Seq("term"))
      .select("query_id", "doc_id", "term", "tf")
    CorpusOps.bm25Rank(tf, dfr,
      live(spark, doclens(prefix), Seq("doc_id", "dl")),
      n, avgdlMilli, k, k1Milli, bMilli)
  }

  /** EXACT-PHRASE search over the positional postings — the retrieval
    * feature tf postings cannot answer ("big order scan" as consecutive
    * tokens, not a bag). Per phrase t₀…tₘ₋₁: the t₀ position list is
    * the anchor, and each later term joins on (doc_id, pos − j = anchor
    * pos) — m−1 equi-joins whose inputs are only the QUERY TERMS'
    * postings, never the corpus (the [[search]] lesson applied: the
    * driver-side term list pushes into the positions scan as a static
    * In(term, …) predicate, so parquet row-group pruning over the
    * term-sorted buckets skips the rest of the vocabulary before the
    * liveness fold — which commutes with the restriction because its
    * grouping includes `term`). A phrase with a repeated token probes
    * the same folded frame at two offsets — correct because position
    * sets are per-term exact.
    *
    * Output per (query_id, matching doc): occurrence count + first
    * match position. Phrases are a bounded driver-side list (the query
    * batch contract, as in [[search]]).
    */
  def phraseSearch(spark: SparkSession, prefix: String,
                   phrases: Seq[(String, String)]): DataFrame = {
    val allTerms = phrases.flatMap(_._2.trim.split("\\s+")).distinct
    val matched = Caches.persistTracked(
      spark.table(positions(prefix))
        .filter(col("term").isin(allTerms: _*))
        .groupBy("term", "doc_id", "pos")
        .agg(sum(col("w")).as("net")).filter(col("net") > 0)
        .select("term", "doc_id", "pos"))
    val perPhrase = phrases.map { case (qid, ptext) =>
      val ts = ptext.trim.split("\\s+")
      val anchor = matched.filter(col("term") === ts(0))
        .select(col("doc_id"), col("pos"))
      ts.indices.drop(1).foldLeft(anchor) { (cur, j) =>
        cur.join(matched.filter(col("term") === ts(j))
            .select(col("doc_id"), (col("pos") - j).as("pos")),
          Seq("doc_id", "pos"))
      }.groupBy("doc_id")
        .agg(count(lit(1)).as("n_hits"),
          min(col("pos")).cast("long").as("first_pos"))
        .select(lit(qid).as("query_id"), col("doc_id"), col("n_hits"),
          col("first_pos"))
    }
    perPhrase.reduce(_.unionByName(_)).orderBy("query_id", "doc_id")
  }

  /** INCREMENTAL refresh from a corpus generation diff — the steady
    * state of a 100 TB serving index when the corpus is republished
    * daily: instead of re-ingesting the whole new generation, the
    * [[graft.operators.TextOps.snapshotDiff]] manifest names exactly
    * the delta, and the index takes down removed+changed docs (their
    * OLD text re-derives the tombstone rows bit-for-bit) and appends
    * added+changed docs' NEW text. Unchanged mass — the bulk at scale
    * — is never RE-INGESTED: the tokenize/postings/write cost is
    * ∝ |delta|. Post-refresh the index answers exactly as one
    * bootstrapped fresh on `newGen` (the q159 gate; CorpusOpsSpec
    * pins bit-equality).
    *
    * Scale shape: the diff is one map-side-digest full-outer join
    * (md5 hashes shuffle, never text — snapshotDiff's contract); the
    * two verdict joins are id-equi-joins against the persisted
    * manifest; ingest itself is the usual per-batch bucketed append.
    * Honest cost note (measured, SCALING.md r14e-ab): the diff and
    * the two join legs are ~4 column-pruned corpus passes, so on
    * short synthetic docs the refresh only breaks even with a full
    * re-ingest — it wins where per-row ingest cost dominates (long
    * real documents, the positional table's ~dl rows per doc), and
    * unconditionally when the delta arrives as an upstream manifest
    * ([[delete]]/[[append]] apply directly, no diff scan).
    */
  def refreshFromDiff(oldGen: DataFrame, newGen: DataFrame,
                      idCol: String, textCol: String,
                      prefix: String): Unit =
    TextOps.refreshViaDiff(oldGen, newGen, idCol, col(textCol))(
      delete(_, idCol, textCol, prefix),
      append(_, idCol, textCol, prefix))

  /** Compact the index's bucketed tables to one file per bucket and
    * net the stats log to a single row — [[Sinks.compactBucketed]]
    * plus the stats-specific rewrite (that table is a plain append log
    * of signed scalars, not bucketed).
    */
  def compact(spark: SparkSession, prefix: String): Unit = {
    Sinks.compactBucketed(spark, postings(prefix), Seq("term"), Buckets)
    Sinks.compactBucketed(spark, doclens(prefix), Seq("doc_id"), Buckets)
    Sinks.compactBucketed(spark, positions(prefix), Seq("term"), Buckets)
    val st = spark.table(stats(prefix))
      .agg(coalesce(sum(col("n")), lit(0L)).as("n"),
        coalesce(sum(col("tt")), lit(0L)).as("tt"))
      .coalesce(1)
    val tmp = stats(prefix) + "_compacting"
    // a stale location from a previous session blocks CREATE
    Sinks.purgeTable(spark, tmp)
    st.write.mode("overwrite").saveAsTable(tmp)
    Sinks.purgeTable(spark, stats(prefix))
    spark.sql(s"ALTER TABLE $tmp RENAME TO ${stats(prefix)}")
  }
}
