package graft

import java.nio.file.Files
import java.time.LocalDate
import graft.ml.RegionModel
import graft.streaming.IncrementalPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structured-Streaming incremental merge + the spark.ml region model. */
class StreamingAndMlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming foreachBatch merge: two micro-batches upsert the snapshot") {
    import spark.implicits._
    val asOf = LocalDate.of(2026, 8, 15)
    val dir = Files.createTempDirectory("graft-stream").toString
    val table = s"$dir/listings"
    val ckpt = s"$dir/ckpt"
    val in = s"$dir/in"

    def listing(url: String, price: Long) =
      EtlQueries.currentListings(spark, "/root/testdata/sf0.001").limit(0)
        .unionByName(
          spark.sql(s"""SELECT '$url' url, 'S1' source, cast(null as string) reid_id,
            't' title, cast(null as string) region,
            timestamp'2026-08-01' scraped_at, timestamp'2026-08-15' created_at,
            timestamp'2026-08-15' updated_at, 'DATA' tab, ${price}L price,
            'IDR' currency, 'Available' availability, true is_available,
            false is_off_plan, 'img' image_url, 'd' description, 'loc' location,
            cast(null as double) leasehold_years, 'Freehold' contract_type,
            'Villa' property_type, 2.0D bedrooms, 1.0D bathrooms,
            cast(null as double) build_size, cast(null as double) land_size,
            cast(null as string) land_zoning, cast(null as string) property_id,
            cast(null as string) listed_date, cast(null as timestamp) sold_at"""))

    val schema = listing("u0", 0L).schema
    def runAvailable(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(in)
      val q = IncrementalPipeline.start(stream, table, asOf, ckpt)
      q.awaitTermination() // AvailableNow drains pending files and stops
    }

    // micro-batch 1: insert u1 → gets a generated sequential reid_id
    listing("u1", 100).write.mode("append").parquet(in)
    runAvailable()
    val after1 = spark.read.parquet(table)
    assert(after1.count() == 1)
    assert(after1.select("reid_id").as[String].head == "REID_26_07_S1_001")

    // micro-batch 2: u1 price change + brand-new u2 (checkpoint ensures
    // only the new files are processed)
    listing("u1", 200).unionByName(listing("u2", 300))
      .write.mode("append").parquet(in)
    runAvailable()
    val after2 = spark.read.parquet(table).orderBy("url")
      .select("url", "price", "reid_id").as[(String, Long, String)].collect()
    assert(after2.toSeq == Seq(
      ("u1", 200L, "REID_26_07_S1_001"), // merged price overwrite, id kept
      ("u2", 300L, "REID_26_07_S1_002"))) // sequence continues from table max
  }

  test("region model learns keyword-region mapping") {
    import spark.implicits._
    val regions = Map(
      "canggu" -> "Badung", "seminyak" -> "Badung", "ubud" -> "Gianyar",
      "sanur" -> "Denpasar", "amed" -> "Karangasem")
    val rows = for {
      (kw, region) <- regions.toSeq
      i <- 1 to 20
    } yield (s"villa in $kw area $i", region)
    val df = rows.toDF("location", "region")
    val model = RegionModel.train(df, numTrees = 20)
    val pred = RegionModel.predict(model, df)
    val acc = pred.filter(col("predicted_region") === col("region")).count()
      .toDouble / rows.size
    assert(acc > 0.95, s"train accuracy $acc")
    // unseen location with a known keyword routes to the right region
    val unseen = Seq("new listing near ubud center").toDF("location")
    assert(RegionModel.predict(model, unseen)
      .select("predicted_region").as[String].head == "Gianyar")
  }

  test("q53: trained RF classifies its training corpus PERFECTLY (diagonal-only)") {
    // q53's DuckDB oracle hard-requires a diagonal confusion matrix; that
    // perfection is an empirical property of the seeded RF + separable
    // synthetic corpus, so pin it directly here — if a Spark/ML upgrade
    // or corpus change ever produces one off-diagonal row, this spec
    // (not just the driver gate) says so, at the real q53 query shape.
    val out = MlQueries.q53RegionMl(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val offDiag = out.filter(r => r.getString(0) != r.getString(1))
    assert(offDiag.isEmpty,
      s"off-diagonal confusion rows: ${offDiag.mkString(", ")}")
    assert(out.forall(_.getAs[Boolean]("acc_ok")))
  }
}
