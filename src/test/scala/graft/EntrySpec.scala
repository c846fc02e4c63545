package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: the flagship composed pipeline (standardize → quality → merge)
  * produces rows on the sf0.001 fixtures — the same check the driver runs.
  */
class EntrySpec extends AnyFunSuite {
  test("entry returns non-empty summary") {
    val rows = SparkEntry.entry(SparkTestSession.spark).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) > 0))
  }
}
