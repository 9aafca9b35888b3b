package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (tests fork a single JVM). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(cores = 4, appName = "graft-test")
  val sf0001 = "/root/testdata/sf0.001"
}
