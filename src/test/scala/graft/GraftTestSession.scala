package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object GraftTestSession {
  lazy val spark: SparkSession = GraftSession.create("local[8]", 8)
  val sf: String = "/root/testdata/sf0.001"
}
