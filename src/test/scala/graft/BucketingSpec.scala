package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB merge-join posture: current and incoming listing tables
  * bucketed by url join with NO shuffle exchange on either side — the
  * physical design that makes the canonical-table MERGE scale (SURVEY §4:
  * "optional bucketing by url for merge joins").
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("url-bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("spark-warehouse/cur_b"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("spark-warehouse/inc_b"))
    spark.sql("DROP TABLE IF EXISTS cur_b")
    spark.sql("DROP TABLE IF EXISTS inc_b")
    val cur = (1 to 1000).map(i => (s"u$i", i * 10L)).toDF("url", "price")
    val inc = (500 to 1500).map(i => (s"u$i", i * 11L)).toDF("url", "price")
    cur.write.mode("overwrite").bucketBy(8, "url").sortBy("url")
      .saveAsTable("cur_b")
    inc.write.mode("overwrite").bucketBy(8, "url").sortBy("url")
      .saveAsTable("inc_b")

    // force sort-merge (tiny test tables would broadcast): the point is
    // that the SMJ needs NO shuffle exchange — bucket layout already
    // co-locates and pre-sorts both sides
    val joined = spark.table("cur_b").as("c").hint("merge")
      .join(spark.table("inc_b").as("i"), col("c.url") === col("i.url"))
      .select(col("c.url"), col("c.price"), col("i.price"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() == 501)

    spark.sql("DROP TABLE cur_b")
    spark.sql("DROP TABLE inc_b")
  }

  test("the full MERGE over Sinks.writeBucketed tables plans no exchange") {
    val d = "/root/testdata/sf0.001"
    val cur = EtlQueries.currentListings(spark, d)
    val inc = EtlQueries.incomingListings(spark, d)
    graft.sources.Sinks.writeBucketed(cur, "merge_cur_b", Seq("url"), 8)
    graft.sources.Sinks.writeBucketed(inc, "merge_inc_b", Seq("url"), 8)
    try {
      val merged = Merge.merge(spark.table("merge_cur_b"),
        spark.table("merge_inc_b"), EtlQueries.asOf)
      val plan = merged.queryExecution.executedPlan.toString
      // the canonical-table layout claim: the full-outer SMJ (and the
      // reid_id window behind it) reuse the bucket partitioning — no
      // url shuffle anywhere in the merge
      assert(!plan.contains("Exchange hashpartitioning(url"),
        s"bucketed merge grew a url shuffle:\n$plan")
      assert(merged.count() > 0)
      // overwrite purges the previous generation's location even
      // across sessions — re-writing the canonical table (the steady-
      // state merge cycle) must not hit LOCATION_ALREADY_EXISTS
      graft.sources.Sinks.writeBucketed(cur, "merge_cur_b", Seq("url"), 8)
      assert(spark.table("merge_cur_b").count() == cur.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS merge_cur_b")
      spark.sql("DROP TABLE IF EXISTS merge_inc_b")
    }
  }
}
