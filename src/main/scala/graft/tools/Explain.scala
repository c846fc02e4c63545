package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan-audit helper: print the formatted physical plan for the named
  * queries (or all) at the given sf dir. Usage:
  *   runMain graft.tools.Explain <sfDir> [q1 q2 ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.get("graft-explain")
    for (n <- names) {
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
