package graft

import org.scalatest.funsuite.AnyFunSuite

/** Kernel semantics of the deterministic BPE tokenizer (graft.Bpe):
  * the delimiter-consuming replace rule, the greedy (count desc, pair
  * asc) merge selection, and the distributed word-frequency → driver
  * learning handoff. The cross-engine (Spark vs DuckDB) equality of
  * the full queries is the driver gate's job (q123/q124).
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("applyMerge: delimiter-consuming non-overlapping passes reach a " +
    "deterministic fixpoint") {
    // one pass merges (1,2) and (4,5) of a 5-run — the shared delimiter
    // space is CONSUMED, so (3,4) cannot merge in the same pass; after
    // the fixed pass budget the result is the variant's documented
    // fixpoint "aa a aa", NOT Sennrich's "aa aa a"
    assert(Bpe.applyMerge(" a a a a a ", "a", "a") == " aa a aa ")
    assert(Bpe.applyMerge(" a a a a ", "a", "a") == " aa aa ")
    assert(Bpe.applyMerge(" a a a ", "a", "a") == " aa a ")
    // non-adjacent tokens unaffected; idempotent at fixpoint
    val fx = Bpe.applyMerge(" x y z ", "a", "b")
    assert(fx == " x y z ")
    assert(Bpe.applyMerge(Bpe.applyMerge(" a b a b ", "a", "b"),
      "a", "b") == " ab ab ")
  }

  test("learn: greedy most-frequent pair with (left, right) tie-break, " +
    "counts weighted by word frequency") {
    val vocab = Seq(("aaab", 2L), ("aab", 1L))
    val m = Bpe.learn(vocab, merges = 2)
    // rank 1: (a,a) = 2 occurrences x cnt 2 + 1 x cnt 1 = 5
    assert(m(0) == Bpe.Merge(1, "a", "a", 5L))
    // after applying: "aa a b </w>" (x2), "aa b </w>" (x1)
    // rank 2: (b, </w>) = 3 beats (aa,a)=2 and (a,b)=2
    assert(m(1) == Bpe.Merge(2, "b", "</w>", 3L))
  }

  test("encodeWord applies ranks in order; charSeg wraps with sentinels") {
    assert(Bpe.charSeg("ab") == " a b </w> ")
    val rules = Seq(("a", "a"), ("b", "</w>"))
    assert(Bpe.encodeWord("aaab", rules) == "aa a b</w>")
    assert(Bpe.encodeWord("aab", rules) == "aa b</w>")
    assert(Bpe.encodeWord("xy", rules) == "x y </w>")
  }

  test("fuzz: encode is LOSSLESS and merge application conserves " +
    "characters over random words and learned rules") {
    // 400 random lowercase words through rules learned from the same
    // fuzz vocab: whatever the rules do, (1) stripping spaces and the
    // end marker from the encoding must reproduce the word exactly,
    // (2) token count only ever decreases vs the char segmentation,
    // (3) encoding is deterministic (same input → same output), and
    // (4) learning is independent of vocab input order
    val rnd = new scala.util.Random(13)
    val words = (0 until 400).map { _ =>
      val len = 1 + rnd.nextInt(12)
      (0 until len).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    }.distinct
    val vocab = words.map(w => (w, 1L + rnd.nextInt(9)))
    val rules = Bpe.learn(vocab, merges = 15).map(m => (m.left, m.right))
    for ((w, _) <- vocab) {
      val enc = Bpe.encodeWord(w, rules)
      val toks = enc.split(' ')
      assert(toks.mkString("").replace(Bpe.EndMark, "") == w,
        s"lossy encode: '$w' -> '$enc'")
      assert(toks.length <= w.length + 1, s"token count grew: '$w' -> '$enc'")
      assert(enc == Bpe.encodeWord(w, rules)) // deterministic
    }
    assert(Bpe.learn(vocab.reverse, merges = 15) ==
      Bpe.learn(vocab, merges = 15)) // input-order independence
  }

  test("learnFromCorpus: the distributed word-frequency pass feeds the " +
    "driver loop identically to a hand count") {
    import spark.implicits._
    // "zz top zz" word freq: zz=2, top=1; words bound to [1, 20] chars
    // and lowercased; the 25-char token is excluded by the length gate
    val docs = Seq(
      (1L, "ZZ top zz!"),
      (2L, "a" * 25 + " zz top-top")).toDF("doc_id", "text")
    val m = Bpe.learnFromCorpus(docs, "text", merges = 4)
    // hand vocab: zz=3, top=3, a-run excluded → same learn() output
    val hand = Bpe.learn(Seq(("top", 3L), ("zz", 3L)), merges = 4)
    assert(m == hand)
  }

  test("build/apply split: encode from the persisted merge table is " +
    "bit-equal to learning inline, and the table is authoritative") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the bat and the cat"),
      (3L, "mat bat rat the the")).toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft_bpe_spec_").toString
    try {
      Bpe.buildMerges(docs, "text", path, merges = 6)
      val prebuilt = spark.read.parquet(path)
      // the persisted artifact IS q123's table
      assert(prebuilt.orderBy("rank").collect().toSeq ==
        Bpe.learnFromCorpus(docs, "text", merges = 6)
          .map(m => org.apache.spark.sql.Row(
            m.rank.toLong, m.left, m.right, m.count)).toSeq)
      // apply-from-prebuilt ≡ learn-inline, bit for bit
      val inline = Bpe.encodeCorpus(docs, "doc_id", "text", merges = 6)
        .collect().toSeq
      val applied = Bpe.encodeCorpus(docs, "doc_id", "text", merges = 6,
        prebuilt = Some(prebuilt)).collect().toSeq
      assert(inline.nonEmpty && inline == applied)
      // the table is AUTHORITATIVE — a handcrafted single-rule table
      // drives the encode (proves the apply path never re-learns):
      // under rule (t, h) alone, "the" → "th e </w>" = 3 tokens
      val custom = Seq((1L, "t", "h", 99L))
        .toDF("rank", "pair_left", "pair_right", "pair_count")
      val one = Bpe.encodeCorpus(
        Seq((7L, "the")).toDF("doc_id", "text"), "doc_id", "text",
        prebuilt = Some(custom)).collect().head
      assert(one.getLong(2) == 3L, s"custom rule not applied: $one")
    } finally {
      val f = new java.io.File(path)
      Option(f.listFiles()).foreach(_.foreach(_.delete())); f.delete()
    }
  }
}
