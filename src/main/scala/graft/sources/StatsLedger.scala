package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Caches, TextOps}

/** Incrementally maintained CORPUS GOVERNANCE STATS — the
  * [[VectorIndex]] mergeable-partial-aggregate posture applied to the
  * data-card numbers every 100 TB corpus publishes (per-source doc /
  * token / char / stopword / short-doc counts, the SUM-mergeable core
  * of [[graft.CorpusOps.sourceProfile]]): each ingest batch appends
  * one signed |sources|-row partial, a takedown appends the same
  * partial with w = -1, and [[profile]] finishes the reduce over the
  * ledger — the corpus text is read once per batch at ingest and
  * NEVER again, so the data card is always current at zero recompute
  * cost. Cross-doc statistics that are not sum-mergeable (duplicate
  * ranks, flags over them) deliberately stay out: they belong to the
  * [[DedupIndex]] family, which maintains the hash-level detail.
  *
  * [[refreshFromDiff]] is the q159 discipline: a republished corpus
  * generation updates the ledger through its snapshot-diff manifest —
  * delete partials re-derived from the removed+changed docs' OLD
  * text, append partials from the added+changed docs' NEW text; the
  * unchanged mass contributes nothing. Post-refresh [[profile]] is
  * bit-equal to aggregating the new generation directly (integer sums
  * commute; the one ratio divides net integers — the q163 gate).
  */
object StatsLedger {

  private[graft] val Logicals = Seq("stats_ledger")

  private def ledger(prefix: String, gen: Long): String =
    Generations.physical(prefix, "stats_ledger", gen)

  /** One tokenization per batch feeds the partial; a takedown (w = -1)
    * re-derives rows matching its insert bit-for-bit. Rows carry the
    * manifest batch id `b`; callers own the intent/commit bracket. */
  private def writeAll(df: DataFrame, textCol: String, srcCol: String,
                       prefix: String, w: Int, gen: Long, b: Long,
                       mode: String): Unit = {
    val spark = df.sparkSession
    val partial = df
      .select(col(srcCol).as("source"),
        length(col(textCol)).cast("long").as("n_chars"),
        TextOps.words(col(textCol)).as("wds"))
      .select(col("source"), col("n_chars"),
        size(col("wds")).cast("long").as("n_tokens"),
        size(filter(col("wds"), x => x.isin("the", "a", "of", "and")))
          .cast("long").as("n_stop"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_stop")).as("n_stop"),
        sum(when(col("n_tokens") < 20, 1L).otherwise(0L)).as("n_short"))
      .withColumn("w", lit(w)).withColumn("b", lit(b))
    if (mode == "overwrite") Sinks.purgeTable(spark, ledger(prefix, gen))
    partial.coalesce(1).write
      .mode(if (mode == "overwrite") "errorifexists" else mode)
      .saveAsTable(ledger(prefix, gen))
  }

  def write(df: DataFrame, textCol: String, srcCol: String,
            prefix: String): Unit = {
    val spark = df.sparkSession
    Generations.beginBootstrap(spark, prefix)
    writeAll(df, textCol, srcCol, prefix, w = 1, gen = 0L, b = 0L,
      mode = "overwrite")
    Generations.commit(spark, prefix, 0L, 0L)
  }

  def append(df: DataFrame, textCol: String, srcCol: String,
             prefix: String): Unit =
    appendBatch(df, textCol, srcCol, prefix, w = 1)

  def delete(df: DataFrame, textCol: String, srcCol: String,
             prefix: String): Unit =
    appendBatch(df, textCol, srcCol, prefix, w = -1)

  private def appendBatch(df: DataFrame, textCol: String, srcCol: String,
                          prefix: String, w: Int): Unit = {
    val spark = df.sparkSession
    val (g, b) = Generations.beginBatch(spark, prefix)
    writeAll(df, textCol, srcCol, prefix, w, g, b, mode = "append")
    Generations.commit(spark, prefix, g, b)
  }

  /** Update the ledger for a republished corpus generation through
    * its diff manifest — cost ∝ |delta|, never |corpus|. The diff
    * signature is (text, source) — the ledger's partials derive from
    * BOTH, so a doc whose source is re-attributed with unchanged text
    * must read 'changed' (delete under the old source, append under
    * the new) or the data card silently keeps the stale attribution;
    * to_json(struct(…)) keeps null text distinct from empty. */
  def refreshFromDiff(oldGen: DataFrame, newGen: DataFrame,
                      idCol: String, textCol: String, srcCol: String,
                      prefix: String): Unit = {
    val spark = oldGen.sparkSession
    // both legs share ONE manifest batch id and ONE commit row — the
    // refresh is all-or-nothing against readers and crashes
    val (g, b) = Generations.beginBatch(spark, prefix)
    TextOps.refreshViaDiff(oldGen, newGen, idCol,
      to_json(struct(col(textCol), col(srcCol))))(
      writeAll(_, textCol, srcCol, prefix, w = -1, g, b, mode = "append"),
      writeAll(_, textCol, srcCol, prefix, w = 1, g, b, mode = "append"))
    Generations.commit(spark, prefix, g, b)
  }

  /** Compact the ledger into the next generation: one netted row per
    * source, then the one-row flip + GC (the [[Bm25Index.compact]]
    * stats posture). */
  def compact(spark: SparkSession, prefix: String,
              retain: Int = 0): Unit = {
    val (gen, bs) = Generations.committedState(spark, prefix)
    val ng = Generations.beginGeneration(spark, prefix)
    val net = spark.table(ledger(prefix, gen))
      .filter(col("b").isin(bs: _*))
      .groupBy("source")
      .agg(sum(col("n_docs") * col("w")).as("n_docs"),
        sum(col("n_tokens") * col("w")).as("n_tokens"),
        sum(col("n_chars") * col("w")).as("n_chars"),
        sum(col("n_stop") * col("w")).as("n_stop"),
        sum(col("n_short") * col("w")).as("n_short"))
      .filter(col("n_docs") =!= 0)
      .withColumn("w", lit(1)).withColumn("b", lit(0L))
    val tgt = ledger(prefix, ng)
    Sinks.purgeTable(spark, tgt)
    net.coalesce(1).write.mode("errorifexists").saveAsTable(tgt)
    Generations.commit(spark, prefix, ng, 0L)
    Generations.gc(spark, prefix, ng, Logicals, retain)
  }

  /** Finish the reduce: the live per-source data card. One scan of a
    * |sources × batches|-row ledger — no corpus read. */
  def profile(spark: SparkSession, prefix: String): DataFrame = {
    val (gen, bs) = Generations.committedState(spark, prefix)
    spark.table(ledger(prefix, gen))
      .filter(col("b").isin(bs: _*))
      .groupBy("source")
      .agg(sum(col("n_docs") * col("w")).as("n_docs"),
        sum(col("n_tokens") * col("w")).as("n_tokens"),
        sum(col("n_chars") * col("w")).as("n_chars"),
        sum(col("n_stop") * col("w")).as("n_stop"),
        sum(col("n_short") * col("w")).as("n_short"))
      .filter(col("n_docs") > 0)
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_chars"),
        round(col("n_stop") / col("n_tokens"), 6).as("stop_ratio"),
        col("n_short"))
      .orderBy("source")
  }
}
