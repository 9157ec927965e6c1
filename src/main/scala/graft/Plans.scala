package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-audit tool: prints the formatted physical plan of the named
  * `SparkEntry.queries` keys (all keys if none given) — the source of
  * the PLANS.md entries. Usage:
  * `runMain graft.Plans <sfDir> [queryKey...]` */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val keys =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.create(s"local[$cpus]", cpus.toInt)
    keys.foreach { k =>
      println(s"\n##PLAN## $k\n")
      val df = SparkEntry.queries(k)(spark, sfDir)
      println(df.queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
