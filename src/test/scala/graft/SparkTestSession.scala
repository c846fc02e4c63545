package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs — small parallelism, AQE off for plan
  * stability, UTC like the production session.
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("graft-test", "2").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
