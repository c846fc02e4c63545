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
