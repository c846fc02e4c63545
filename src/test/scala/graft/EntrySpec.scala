package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: the flagship composed pipeline (standardize → quality → merge)
  * produces rows on the sf0.001 fixtures — the same check the driver runs.
  */
class EntrySpec extends AnyFunSuite {
  test("bench subset: registry names pass through, typos fail naming the entry") {
    // a valid subset benches exactly what was asked — including registry
    // queries outside the default headline (q03 is not a headline query)
    assert(Bench.headline(Some("q36_minhash_lsh,q03_filter_project")) ==
      Seq("q36_minhash_lsh", "q03_filter_project"))
    // a typo must fail loudly (not an empty rc-0 bench run) and name the
    // unmatched entry
    val e = intercept[IllegalArgumentException] {
      Bench.headline(Some("q36_minhash_lsh,q99_nope"))
    }
    assert(e.getMessage.contains("q99_nope"))
    // no subset → the default headline, every name benchable (the
    // registry plus Bench.benchOnly's production-hash twins)
    val base = Bench.headline(None)
    assert(base.nonEmpty && base.forall(Bench.benchable.contains))
    // the twins are benchable but NOT registry queries — the driver's
    // oracle surface is untouched by bench-only entries
    assert(Bench.benchOnly.keySet.forall(base.contains))
    assert(Bench.benchOnly.keySet
      .forall(k => !SparkEntry.queries.contains(k)))
  }

  test("bench iteration schedule: tight committed history -> 1 draw, " +
    "everything else keeps the full min-of-N") {
    val mins = Map("q_tight" -> 5.0, "q_loose" -> 5.0, "q_tiny" -> 0.2,
      "q_edge" -> 0.5)
    val spreads = Map("q_tight" -> 12.0, "q_loose" -> 75.0)
    def s(n: String) = Bench.scheduledIters(n, 3, mins, spreads)
    // heavy + repeatable history: one draw (the budget win)
    assert(s("q_tight") == 1)
    // loose committed spread with history: min-of-2 — three draws
    // demonstrably don't converge for these rows on one box-day
    assert(s("q_loose") == 2)
    // sub-half-second rows re-run min-of-3 regardless (cheap insurance
    // where single-draw jitter is largest relative to the value)
    assert(s("q_tiny") == 3)
    // no committed history (new row this round): full schedule
    assert(s("q_new") == 3)
    // boundary: 0.5 s min but NO committed spread entry (bench_out's
    // full map records every timed row, so absence means the history
    // can't certify TIGHTNESS) — treated as loose: min-of-2
    assert(s("q_edge") == 2)
  }

  test("bench part slice: interleaved, disjoint, covering, loud on junk") {
    val names = ('a' to 'g').map(_.toString)
    val p1 = Bench.partSlice(names, 1, 2)
    val p2 = Bench.partSlice(names, 2, 2)
    // interleave: heavy rows scattered across parts, not front-loaded
    assert(p1 == Seq("a", "c", "e", "g") && p2 == Seq("b", "d", "f"))
    // disjoint cover of the input
    assert((p1 ++ p2).sorted == names.sorted)
    // 1/1 is the identity — a driver can wire the part env unconditionally
    assert(Bench.partSlice(names, 1, 1) == names)
    intercept[IllegalArgumentException](Bench.partSlice(names, 3, 2))
    intercept[IllegalArgumentException](Bench.partSlice(names, 0, 2))
  }

  test("bench listOf extracts error arrays; newestSnapshot picks max round") {
    assert(Bench.listOf("""{"errors":["q1","q2"],"x":1}""", "errors") ==
      Seq("q1", "q2"))
    assert(Bench.listOf("""{"errors":[],"x":1}""", "errors").isEmpty)
    assert(Bench.listOf("""{"x":1}""", "errors").isEmpty)
    val dir = java.nio.file.Files.createTempDirectory("snaptest").toFile
    assert(Bench.newestSnapshot(dir).isEmpty)
    java.nio.file.Files.writeString(dir.toPath.resolve("BENCH_OUT_r3.json"), "{}")
    java.nio.file.Files.writeString(dir.toPath.resolve("BENCH_OUT_r12.json"), "{}")
    assert(Bench.newestSnapshot(dir) == Some((12, "BENCH_OUT_r12.json")))
  }

  test("registry/oracle alignment: every query carries oracle SQL, no " +
    "orphan oracles, numbering gap-free") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    // a missing oracle silently downgrades the driver gate to a
    // rows-only check — make the omission loud instead
    assert((q -- o).isEmpty, s"queries without oracles: ${q -- o}")
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    val nums = q.map(_.drop(1).takeWhile(_.isDigit).toInt)
    assert(nums == (1 to nums.max).toSet,
      s"query numbering has gaps: missing ${(1 to nums.max).toSet -- nums}")
  }

  test("entry returns non-empty summary") {
    val rows = SparkEntry.entry(SparkTestSession.spark).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) > 0))
  }
}
