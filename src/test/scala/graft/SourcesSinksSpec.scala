package graft

import java.nio.file.Files
import graft.functions.Cleaners
import graft.sources.{Sinks, Sources}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source connectors and sink shapes (SURVEY §2.1). */
class SourcesSinksSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("jsonLd extracts offers paths") {
    val df = Seq(
      """{"name": "Villa X", "offers": {"price": 250000, "priceCurrency": "USD"}}""",
      """not json at all""").toDF("script")
    val out = Sources.jsonLd(df, "script").collect()
    assert(out(0).getLong(0) == 250000L && out(0).getString(1) == "USD" &&
      out(0).getString(2) == "Villa X")
    assert(out(1).isNullAt(0)) // null-on-error like the reference
  }

  test("uploadQueueFilter: availability, http, blacklist, anti-join, dedup") {
    val upload = Seq(
      ("https://good.com/a", "Available"),
      ("https://good.com/a", "Available"), // dup
      ("https://bad.com/x", "Available"),  // blacklisted domain
      ("https://good.com/sold", "Sold"),   // not available
      ("ftp://weird/x", "Available"),      // not http
      ("https://good.com/queued", "Available")) // already queued
      .toDF("Property Link", "Availability")
    val queue = Seq("https://good.com/queued").toDF("url")
    val out = Sources.uploadQueueFilter(upload, queue, Seq("bad.com"))
      .as[String].collect().toSet
    assert(out == Set("https://good.com/a"))
  }

  test("seedScan pushes domain + date filters") {
    val listings = Seq(
      ("https://a.com/1", "2026-07-01"),
      ("https://a.com/2", "2026-05-01"),
      ("https://b.com/3", "2026-07-01")).toDF("url", "created_at")
      .withColumn("created_at", col("created_at").cast("timestamp"))
    val out = Sources.seedScan(listings, "a.com", lit("2026-06-01").cast("timestamp"))
      .as[String].collect().toSeq
    assert(out == Seq("https://a.com/1"))
  }

  test("constrainedAppend enforces the unique key across batches") {
    val dir = Files.createTempDirectory("graft-sink").toString + "/errors"
    val b1 = Seq(("u1", "boom"), ("u1", "boom"), ("u2", "ouch"))
      .toDF("url", "error_message")
    Sinks.constrainedAppend(b1, dir, Seq("url", "error_message"))
    assert(spark.read.parquet(dir).count() == 2)
    // second batch: one known pair, one new
    val b2 = Seq(("u1", "boom"), ("u3", "new")).toDF("url", "error_message")
    Sinks.constrainedAppend(b2, dir, Seq("url", "error_message"))
    val rows = spark.read.parquet(dir).as[(String, String)].collect().toSet
    assert(rows == Set(("u1", "boom"), ("u2", "ouch"), ("u3", "new")))
  }

  test("stagingAppend partitions by source and month") {
    val dir = Files.createTempDirectory("graft-staging").toString + "/p"
    val df = Seq(("u1", "S1", "2026-07-15"), ("u2", "S2", "2026-08-02"))
      .toDF("url", "source", "scraped_at")
      .withColumn("scraped_at", col("scraped_at").cast("timestamp"))
    Sinks.stagingAppend(df, dir)
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("source="))
    assert(dirs.toSet == Set("source=S1", "source=S2"))
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("missingFields audit with conditional exemptions") {
    val df = Seq(
      ("u1", "t", "Leasehold", None: Option[Double], true, None: Option[String]),
      ("u2", "", "Freehold", None, false, None))
      .toDF("url", "title", "contract_type", "leasehold_years", "is_available", "sold_at")
      .withColumn("sold_at", col("sold_at").cast("timestamp"))
    val out = df.select(Quality.missingFields(df,
      Seq("title", "leasehold_years", "sold_at")).as("m"))
      .as[Seq[String]].collect().toSeq
    assert(out == Seq(
      Seq("leasehold_years"),          // leasehold without years
      Seq("title", "sold_at")))        // empty title; unavailable without sold_at
  }

  test("maxProcessor / takeNth array processors") {
    val df = Seq((Seq(3.0, 9.0, 5.0), Seq(" a ", "b "))).toDF("nums", "strs")
    val r = df.select(Cleaners.maxProcessor(col("nums")),
      Cleaners.takeNth(col("strs"), 1), Cleaners.takeNth(col("strs"), 5))
      .collect().head
    assert(r.getDouble(0) == 9.0 && r.getString(1) == "b" && r.isNullAt(2))
  }

  test("writeShards: one file per (source, shard) dir, per-shard token " +
    "mass within the straddle bound, read-back manifest lossless") {
    val dir = "/tmp/graft_sink_shards_spec"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(dir))
    val packed = CorpusOps.mixPack(
        Tables.documents(spark, "/root/testdata/sf0.001"),
        "doc_id", "text", "source")
      .withColumn("shard_id", expr("seq_start div 16"))
    val expected = CorpusQueries.shardManifest(packed).collect()
    Sinks.writeShards(packed, dir, Seq("source", "shard_id"))
    // exactly ONE parquet data file per shard directory — the
    // delivery-unit contract (repartition-aligned partitionBy)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("source="))
      .flatMap(_.listFiles())
      .filter(f => f.isDirectory && f.getName.startsWith("shard_id="))
    assert(shardDirs.nonEmpty)
    for (sd <- shardDirs) {
      val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${sd.getName}: ${files.length} files")
    }
    val back = spark.read.parquet(dir)
    // per-shard token budget: 16 sequences × 512 tokens, plus at most
    // one straddling instance's spill (assignment is by FIRST sequence)
    val maxToks = packed.agg(max(col("toks"))).head().getLong(0)
    val over = back.groupBy("source", "shard_id")
      .agg(sum(col("toks")).as("tok_mass"))
      .filter(col("tok_mass") > 16L * 512L + maxToks)
      .count()
    assert(over == 0L)
    // lossless roundtrip: manifest from the files == manifest from the
    // in-memory frame, row for row (content hash included)
    val got = CorpusQueries.shardManifest(back).collect()
    assert(got.map(_.toString).sameElements(expected.map(_.toString)))
    Caches.clear()
    rm(new java.io.File(dir))
  }

  test("inParallelMap (r21): results in task order, original exception " +
    "propagates unwrapped, empty/singleton run inline") {
    assert(Sinks.inParallelMap(Seq.empty[() => Int]).isEmpty)
    assert(Sinks.inParallelMap(Seq(() => 7)) == Seq(7))
    // order is task order, not completion order
    val out = Sinks.inParallelMap(Seq(
      () => { Thread.sleep(50); "slow" },
      () => "fast"))
    assert(out == Seq("slow", "fast"))
    // the index writers' callers match on concrete exception types
    // (Generations' require, Spark's AnalysisException) — the pool
    // must rethrow the CAUSE, not ExecutionException
    val boom = intercept[IllegalStateException] {
      Sinks.inParallelMap(Seq(
        () => 1,
        () => throw new IllegalStateException("boom")))
    }
    assert(boom.getMessage == "boom")
  }
}
