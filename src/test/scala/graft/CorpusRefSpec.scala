package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized-REFERENCE tests for the late-r12 corpus operators: 200
  * seeded random docs over a small vocabulary (so chunk/bigram
  * collisions actually occur), each operator run ONCE as a Spark job,
  * every output row asserted against an independent Scala reference
  * implementation — the Spark-plan-level complement to the
  * known-answer cases in CorpusOpsSpec.
  */
class CorpusRefSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")
  private val docs: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(42)
    (0L until 200L).map { i =>
      val n = 1 + rnd.nextInt(40)
      // every 9th doc repeats an earlier doc's prefix words so whole
      // 10-word chunks collide across docs
      val words =
        if (i % 9 == 0) Vector.fill(n)(vocab(0))
        else Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))
      (i, words.mkString(" "))
    }
  }
  private lazy val df = docs.toDF("doc_id", "text")
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("chunkTable rows match the Scala reference on 200 random docs") {
    val width = 8; val stride = 4
    val out = CorpusOps.chunkTable(df, "doc_id", "text", width, stride)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
    for ((id, text) <- docs) {
      val w = text.split("\\s+").toVector
      val nch = math.max(1,
        math.ceil((w.length - width).toDouble / stride).toInt + 1)
      val got = out(id).sortBy(_.getAs[Long]("chunk_id"))
      assert(got.length == nch, s"doc $id chunk count")
      for ((r, ci) <- got.zipWithIndex) {
        val slice = w.slice(ci * stride, ci * stride + width)
        assert(r.getAs[Long]("start_tok") == ci * stride + 1)
        assert(r.getAs[Long]("n_tok") == slice.length, s"doc $id chunk $ci")
        assert(r.getAs[String]("chunk_hash") == md5Hex(slice.mkString(" ")))
      }
    }
  }

  test("paragraphDedup rows match the Scala reference on 200 random docs") {
    val width = 10; val minFreq = 2
    def chunksOf(text: String): Vector[String] = {
      val w = text.split("\\s+").toVector
      (0 until (w.length + width - 1) / width)
        .map(i => w.slice(i * width, i * width + width).mkString(" "))
        .toVector
    }
    val freq = docs.flatMap(d => chunksOf(d._2))
      .groupBy(identity).map { case (c, xs) => c -> xs.length }
    val out = CorpusOps.paragraphDedup(df, "doc_id", "text", width, minFreq)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for ((id, text) <- docs) {
      val ch = chunksOf(text)
      val kept = ch.filter(freq(_) < minFreq)
      val r = out(id)
      assert(r.getAs[Long]("n_paragraphs") == ch.length, s"doc $id")
      assert(r.getAs[Long]("n_dropped") == ch.count(freq(_) >= minFreq))
      assert(r.getAs[String]("retained_hash") == md5Hex(kept.mkString(" ")),
        s"doc $id reassembly")
    }
  }

  test("vocabEncode rows match the Scala reference on 200 random docs") {
    val v = 4
    val counts = docs.flatMap(_._2.split("\\s+"))
      .groupBy(identity).map { case (t, xs) => t -> xs.length }
    val ids = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(v)
      .zipWithIndex.map { case ((t, _), i) => t -> (i + 1L) }.toMap
    val out = CorpusOps.vocabEncode(df, "doc_id", "text", v)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for ((id, text) <- docs) {
      val w = text.split("\\s+").toVector
      val enc = w.map(ids.getOrElse(_, 0L))
      val r = out(id)
      assert(r.getAs[Long]("n_tokens") == w.length)
      assert(r.getAs[Long]("n_oov") == enc.count(_ == 0L), s"doc $id")
      assert(r.getAs[String]("ids_hash") == md5Hex(enc.mkString(",")))
    }
  }

  test("bigramLmScore rows match the Scala reference on 200 random docs") {
    val minCount = 3; val cap = 10
    def bigrams(text: String): Vector[String] = {
      val w = text.split("\\s+").toVector
      if (w.length < 2) Vector.empty
      else w.sliding(2).map(_.mkString(" ")).toVector
    }
    val c2 = docs.flatMap(d => bigrams(d._2))
      .groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    val out = CorpusOps.bigramLmScore(df, "doc_id", "text", minCount, cap)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for ((id, text) <- docs) {
      val bg = bigrams(text)
      val r = out(id)
      assert(r.getAs[Long]("n_bigrams") == bg.length, s"doc $id")
      assert(r.getAs[Long]("n_frequent") == bg.count(c2(_) >= minCount))
      assert(r.getAs[Long]("fam_sum") ==
        bg.map(b => math.min(c2(b), cap.toLong)).sum, s"doc $id fam")
    }
  }
}
