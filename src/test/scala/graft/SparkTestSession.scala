package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs — small parallelism, otherwise the
  * production GraftSession posture (AQE + skew-join splitting on, UTC),
  * so plan-shape assertions test what actually ships.
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("graft-test", "2").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
