package graft.tools

import graft.{Caches, GraftSession, SparkEntry}

/** Timing helper for one query: repeated noop-sink materializations
  * (same methodology as Bench) so a change's effect on a single query
  * is measurable without the full bench loop. Usage:
  *   runMain graft.tools.Profile <sfDir> <query> [iters]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val iters = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.get("graft-profile")
    val fn = SparkEntry.queries(name)
    for (i <- 1 to iters) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      Caches.clear()
      println(f"[profile] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
