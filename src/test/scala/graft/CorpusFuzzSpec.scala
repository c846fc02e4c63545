package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz/fixed-point properties for the row-local corpus screens: 300
  * seeded adversarial URLs and PII texts in one DataFrame per property
  * (one Spark job each), asserting the algebraic properties the
  * operators' contracts promise — canonicalization and redaction are
  * IDEMPOTENT, canonical outputs are canonical-form, and redaction
  * removes every detectable span.
  */
class CorpusFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.size))

  test("urlCanonicalize is idempotent and strips every tracked artifact") {
    val schemes = Seq("http", "HTTP", "https", "HTTPS")
    val hosts = Seq("www.Ex.COM", "ex.com", "WWW.a-b.org", "sub.www.net")
    val paths = Seq("", "/", "/a", "/a/b/", "/a//", "/Listing/7///")
    val queries = Seq("", "?utm_source=x", "?id=1", "?utm_a=1&id=2",
      "?id=2&utm_b=3", "?utm_a=1&utm_b=2", "?a=1&b=2&utm_c=3&d=4")
    val frags = Seq("", "#f", "#frag?x=1")
    val urls = (0 until 300).map { i =>
      (i.toLong, s"${pick(schemes)}://${pick(hosts)}${pick(paths)}" +
        s"${pick(queries)}${pick(frags)}")
    }
    val df = urls.toDF("doc_id", "url")
    val once = CorpusOps.urlCanonicalize(df, "doc_id", "url")
      .select(col("doc_id"), col("canonical_url"))
    val cache = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // idempotence: canonicalizing the canonical forms is the identity
    val twice = CorpusOps.urlCanonicalize(
      once.withColumnRenamed("canonical_url", "url"), "doc_id", "url")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("canonical_url")).toMap
    assert(twice == cache)
    // canonical-form invariants: lowercase scheme/host, no www., no
    // fragment, no utm params, no trailing path slash
    for ((id, c) <- cache) {
      val scheme = c.takeWhile(_ != ':')
      assert(scheme == scheme.toLowerCase, s"$id: $c")
      assert(!c.contains("#"), s"$id kept a fragment: $c")
      assert(!c.contains("utm_"), s"$id kept a utm param: $c")
      assert(!c.matches("^[a-z]+://www\\..*"), s"$id kept www: $c")
      val beforeQuery = c.split("\\?")(0)
      assert(!beforeQuery.matches(".*://.+/$"), s"$id trailing slash: $c")
      assert(!c.contains("?&") && !c.endsWith("?") && !c.endsWith("&"),
        s"$id malformed query separators: $c")
    }
  }

  test("piiScreen redaction is idempotent and leaves no detectable span") {
    val bits = Seq(
      "plain words here", "a.b@c.io", "x+tag@sub.domain.co.uk",
      "10.0.0.1", "255.255.255.255", "call +1 234-56789",
      "+62 8123-123456", "not@an", "1.2.3", "999 dots. everywhere.",
      "trailing@dot.com.", "<EMAIL>", "v1.2.3.4beta")
    val texts = (0 until 300).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(5))(pick(bits)).mkString(" "))
    }
    val df = texts.toDF("doc_id", "text")
    val redacted = df.select(col("doc_id"),
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        CorpusOps.emailRe, "<EMAIL>"),
        CorpusOps.ipRe, "<IP>"),
        CorpusOps.phoneRe, "<PHONE>").as("text"))
    // the redacted text contains no remaining matches of any class
    val counts = CorpusOps.piiScreen(redacted, "doc_id", "text").collect()
    for (r <- counts) {
      assert(!r.getAs[Boolean]("has_pii"),
        s"doc ${r.getLong(0)} still detectable after redaction")
    }
    // and therefore redaction is a fixed point: hash(redact(redacted))
    // equals hash(redacted)
    val again = CorpusOps.piiScreen(redacted, "doc_id", "text")
      .select(col("doc_id"), col("redacted_hash")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val direct = redacted.select(col("doc_id"), md5(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == direct)
  }
}
